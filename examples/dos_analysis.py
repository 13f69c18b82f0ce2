"""Vibrational DOS: type-projected partial densities of a diatomic chain.

The DOS — the Fourier transform of the velocity autocorrelation — is the
k-independent companion of the SED.  On a diatomic chain the acoustic band
(below the gap) is dominated by the HEAVY sublattice and the optical band
(above the gap) by the LIGHT one; the type-projected partial DOS makes that
visible, and the band edges land on the analytic ω±(k) extrema.

Run:  python examples/dos_analysis.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # run from anywhere without installing
from pathlib import Path

import numpy as np

from psa_tpu import SEDCalculator
from psa_tpu.models import diatomic_chain_branches, make_diatomic_chain_trajectory

OUT = Path("sed_output")
OUT.mkdir(exist_ok=True)

KAPPA, M1, M2, A = 800.0, 1.0, 3.0, 5.0
traj = make_diatomic_chain_trajectory(n_cells=64, n_frames=1024, dt_ps=0.02,
                                      a=A, kappa=KAPPA, m1=M1, m2=M2, seed=0)
calc = SEDCalculator(traj, nx=64, ny=1, nz=1)

freqs, dos = calc.calculate_dos(basis_atom_types=[1, 2], max_freq=12.0)
light, heavy = dos[0], dos[1]          # type 1 = m1 (light), type 2 = m2

# analytic band edges (rad/ps -> THz) at the zone boundary / center
k_edge = np.array([np.pi])             # k·a = π
w_ac, w_op, _, _ = diatomic_chain_branches(k_edge, KAPPA, M1, M2)
nu_ac_max = w_ac[0] / (2 * np.pi)      # top of the acoustic band
nu_op_min = w_op[0] / (2 * np.pi)      # bottom of the optical band
gap = (freqs > nu_ac_max + 0.3) & (freqs < nu_op_min - 0.3)
print(f"acoustic top {nu_ac_max:.2f} THz, optical bottom {nu_op_min:.2f} THz")
print(f"DOS inside the gap: {dos[:, gap].max():.3e} "
      f"(max overall {dos.max():.3e}) — bands are gapped")

# band character: heavy dominates acoustic, light dominates optical
ac = (freqs > 0.5) & (freqs < nu_ac_max)
op = freqs > nu_op_min
print(f"acoustic band: heavy/light weight = "
      f"{heavy[ac].sum() / max(light[ac].sum(), 1e-30):.2f} (>1 expected)")
print(f"optical band:  light/heavy weight = "
      f"{light[op].sum() / max(heavy[op].sum(), 1e-30):.2f} (>1 expected)")

try:
    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.plot(freqs, light, label=f"type 1 (m={M1})")
    ax.plot(freqs, heavy, label=f"type 2 (m={M2})")
    ax.axvspan(nu_ac_max, nu_op_min, alpha=0.15, color='gray', label='gap')
    ax.set_xlabel("frequency (THz)")
    ax.set_ylabel("partial DOS (arb.)")
    ax.legend()
    fig.savefig(OUT / "partial_dos.png", dpi=130, bbox_inches='tight')
    print(f"plot: {OUT / 'partial_dos.png'}")
except ImportError:
    pass
