"""Basic SED analysis: k-path dispersion of a synthetic chain.

Port of the reference example (reference: examples/basic_sed_analysis.py),
made self-contained: instead of requiring an external LAMMPS file it
synthesizes a 1D chain whose dispersion is exactly ω = ω_max·|sin(ka/2)| —
so you can see the physics line up.

Run:  python examples/basic_sed_analysis.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # run from anywhere without installing
from pathlib import Path

import numpy as np

from psa_tpu import SEDCalculator, SEDPlotter
from psa_tpu.models import make_chain_trajectory

OUT = Path("sed_output")
OUT.mkdir(exist_ok=True)

# 1. Trajectory (swap for: TrajectoryLoader("traj.dump", dt=0.02).load())
N_CELLS, A0, OMEGA_MAX = 64, 2.5, 10.0
traj = make_chain_trajectory(n_cells=N_CELLS, n_frames=512, dt_ps=0.02,
                             a=A0, omega_max_thz=OMEGA_MAX)
print(f"Trajectory: {traj.n_frames} frames, {traj.n_atoms} atoms")

# 2. Engine
calc = SEDCalculator(traj, nx=N_CELLS, ny=1, nz=1)

# 3. k-path from Γ to the BZ edge and SED
k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=N_CELLS // 2 + 1)
sed = calc.calculate(k_mags, k_vecs, summation_mode='coherent')
sed.save(OUT / "chain_sed")

# 4. Dispersion plot
SEDPlotter(sed, '2d_intensity', str(OUT / "dispersion.png"),
           title=f"1D chain dispersion (analytic: {OMEGA_MAX}·|sin(ka/2)| THz)",
           max_freq=OMEGA_MAX * 1.2, intensity_scale='sqrt').generate_plot()

# 5. Check the peaks against the analytic curve
inten, freqs = sed.intensity, sed.freqs
pos = freqs >= 0
peaks = freqs[pos][np.argmax(inten[pos], axis=0)]
analytic = OMEGA_MAX * np.abs(np.sin(k_mags * A0 / 2))
print("max |peak - analytic| =", np.abs(peaks[1:] - analytic[1:]).max(), "THz")
print(f"outputs in {OUT}/")
