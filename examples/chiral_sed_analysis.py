"""Chiral SED: phase difference between two polarization components.

Port of the reference example (reference: examples/chiral_sed_analysis.py) on
a self-contained synthetic crystal.

Run:  python examples/chiral_sed_analysis.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # run from anywhere without installing
from pathlib import Path

from psa_tpu import SED, SEDCalculator, SEDPlotter
from psa_tpu.models import make_random_crystal_trajectory

OUT = Path("sed_output")
OUT.mkdir(exist_ok=True)

traj = make_random_crystal_trajectory(n_cells_xyz=(6, 6, 4), basis=2,
                                      n_frames=256, dt_ps=0.02, a=5.43)
calc = SEDCalculator(traj, nx=6, ny=6, nz=4)

# Coherent SED along [110] (chiral analysis needs complex amplitudes)
k_mags, k_vecs = calc.get_k_path('110', bz_coverage=1.0, n_k=100)
sed = calc.calculate(k_mags, k_vecs, summation_mode='coherent')

# Phase between the two components perpendicular to the chiral axis 'z':
# components (0, 1) = (x, y).
phase = calc.calculate_chiral_phase(sed.sed[:, :, 0], sed.sed[:, :, 1],
                                    angle_range_opt='C')
sed_chiral = SED(sed.sed, sed.freqs, sed.k_points, sed.k_vectors, phase=phase)
sed_chiral.save(OUT / "chiral_sed")

SEDPlotter(sed_chiral, '2d_phase', str(OUT / "chiral_phase.png"),
           title="Chiral phase Δφ(k, ω), axis z", cmap='twilight',
           max_freq=25.0).generate_plot()
SEDPlotter(sed_chiral, '2d_intensity', str(OUT / "chiral_intensity.png"),
           max_freq=25.0, intensity_scale='dsqrt').generate_plot()
print(f"outputs in {OUT}/")
