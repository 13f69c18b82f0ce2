"""iSED: reconstruct the real-space atomic motion of one (k, ω) mode.

Port of the reference example (reference: examples/ised_reconstruction.py).

Run:  python examples/ised_reconstruction.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # run from anywhere without installing
from pathlib import Path

from psa_tpu import SEDCalculator
from psa_tpu.models import make_chain_trajectory

OUT = Path("sed_output")
OUT.mkdir(exist_ok=True)

N_CELLS, A0, OMEGA_MAX = 48, 2.5, 10.0
traj = make_chain_trajectory(n_cells=N_CELLS, n_frames=512, dt_ps=0.02,
                             a=A0, omega_max_thz=OMEGA_MAX)
calc = SEDCalculator(traj, nx=N_CELLS, ny=1, nz=1)

# Reconstruct the mode nearest k = 0.8 (2π/Å), ω = 8 THz: writes a LAMMPS dump
# animation (open in OVITO) and a spectrum plot with the target marker.
calc.ised(k_dir_spec='x', k_target=0.8, w_target=8.0, char_len_k_path=A0,
          nk_on_path=N_CELLS // 2 + 1, bz_cov_ised=0.5,
          rescale_factor='auto', n_recon_frames=100,
          dump_filepath=str(OUT / "ised_motion.dump"),
          plot_dir_ised=OUT, plot_max_freq=12.0)
print(f"outputs in {OUT}/ (ised_motion.dump + iSED_*.png)")
