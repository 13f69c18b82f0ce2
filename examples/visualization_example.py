"""All plot types on one synthetic SED (reference: examples/visualization_example.py)."""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # run from anywhere without installing
from pathlib import Path

import numpy as np

from psa_tpu import SED, SEDPlotter, apply_style

OUT = Path("sed_output/viz")
OUT.mkdir(parents=True, exist_ok=True)

# Synthetic SED with two dispersive branches
n_freq, n_k = 256, 80
freqs = np.fft.fftfreq(n_freq, d=0.05)
k_points = np.linspace(0, 2.0, n_k).astype(np.float32)
k_vectors = np.outer(k_points, [1, 0, 0]).astype(np.float32)
sed_data = np.zeros((n_freq, n_k, 3), dtype=np.complex64)
for branch, speed in ((0, 4.0), (1, 7.0)):
    for i, k in enumerate(k_points):
        w = speed * np.abs(np.sin(k * 1.2))
        idx = np.argmin(np.abs(freqs - w))
        sed_data[idx, i, branch] = 10.0 + 5j
sed_data += 0.05 * (np.random.default_rng(0).normal(size=sed_data.shape)
                    + 1j * np.random.default_rng(1).normal(size=sed_data.shape))
phase = np.clip(np.angle(sed_data[:, :, 0] + 1e-9), -np.pi / 2, np.pi / 2)
sed = SED(sed_data.astype(np.complex64), freqs, k_points, k_vectors,
          phase=phase.astype(np.float32))

apply_style(color_scheme='scientific')
SEDPlotter(sed, '2d_intensity', str(OUT / "intensity.png"),
           max_freq=8.0, intensity_scale='log').generate_plot()
SEDPlotter(sed, '2d_phase', str(OUT / "phase.png"),
           cmap='twilight', max_freq=8.0).generate_plot()
SEDPlotter(sed, '1d_slice', str(OUT / "slice_k.png"), k_index=20).generate_plot()
SEDPlotter(sed, '1d_slice', str(OUT / "slice_w.png"), freq_index=30).generate_plot()
SEDPlotter(sed, 'frequency_slice', str(OUT / "freq_slice.png"),
           target_frequency=4.0).generate_plot()

# Grid SED for the heatmap type
gn = 25
kx = np.linspace(-1, 1, gn, dtype=np.float32)
kv_grid = np.stack([np.repeat(kx, gn), np.tile(kx, gn), np.zeros(gn * gn, np.float32)], 1)
r = np.hypot(kv_grid[:, 0], kv_grid[:, 1])
grid_data = np.zeros((n_freq, gn * gn, 3), dtype=np.complex64)
for fi in range(n_freq):
    if freqs[fi] < 0:
        continue
    grid_data[fi, :, 0] = np.exp(-((r * 4 - freqs[fi]) ** 2))
sed_grid = SED(grid_data, freqs, np.array([]), kv_grid, k_grid_shape=(gn, gn))
SEDPlotter(sed_grid, '3d_heatmap', str(OUT / "heatmap.png"),
           heatmap_target_freq_thz=2.0, theme='dark').generate_plot()
print(f"outputs in {OUT}/")
