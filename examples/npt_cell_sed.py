"""NPT SED: phonon spectra under a drifting simulation cell.

The standard SED anchor exp(i k·r̄) (reference sed_calculator.py:78, which
assumes a constant box, :30-56) maps modes through one fixed cell.  Under
an NPT barostat the cell drifts: k-vectors built from the frame-0 box land
INCOMMENSURATE on the time-mean lattice, the per-atom phases dephase, and
a commensurate phonon's projected weight drops and leaks into neighboring
k columns.  `calculate_npt` anchors in FRACTIONAL space instead —
exp(2πi m·s̄) with s(t) = h(t)⁻¹ r(t) — invariant under any volume or
shape drift, so the projection stays exact no matter what the barostat
does.

This example builds a 1D chain carrying ONE commensurate phonon
(mode m = 7 at ν = 4 THz) inside a cell that expands linearly by 10%
over the run (mean cell 5% off frame 0):

  1. the fixed-cell engine with frame-0 k-mapping: captured peak drops,
     weight spreads across neighbor modes;
  2. `calculate_npt` at integer Miller points: the line is clean and
     the neighbors carry ~nothing;
  3. both mode-resolved spectra are plotted side by side.

With a real NPT dump (LAMMPS `fix npt`), `TrajectoryLoader` fills
`Trajectory.box_matrices` automatically from the per-frame BOX BOUNDS,
and the CLI exposes this flow as the optional `npt:` config section.

Run:  python examples/npt_cell_sed.py
"""
import sys as _sys
from pathlib import Path as _Path
_sys.path.insert(0, str(_Path(__file__).resolve().parents[1]))  # run from anywhere without installing
from pathlib import Path

import matplotlib
matplotlib.use('Agg')
import matplotlib.pyplot as plt
import numpy as np

from psa_tpu import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays

OUT = Path(__file__).with_suffix('') / 'output'
OUT.mkdir(parents=True, exist_ok=True)

# --- a chain with one commensurate phonon, in a drifting cell -----------
n_cells, a, n_frames, dt_ps = 32, 2.5, 512, 0.01
mode_m, nu_thz, amp = 7, 4.0, 0.02
L0 = n_cells * a
t = np.arange(n_frames) * dt_ps
lam = 1.0 + 0.10 * np.linspace(0.0, 1.0, n_frames)      # 10% linear expansion
x_frac = (np.arange(n_cells) + 0.5) / n_cells
phase = 2 * np.pi * (mode_m * x_frac[None, :] - nu_thz * t[:, None])
s = x_frac[None, :] + (amp / L0) * np.sin(phase)        # fractional coords

boxes = lam[:, None, None] * np.diag([L0, 10.0, 10.0])[None]
pos = np.zeros((n_frames, n_cells, 3), dtype=np.float32)
pos[:, :, 0] = (lam[:, None] * L0) * s
vel = np.zeros_like(pos)                                 # co-moving phonon velocity
vel[:, :, 0] = (lam[:, None] * amp * (-2 * np.pi * nu_thz)
                * np.cos(phase)).astype(np.float32)

box0 = boxes[0].astype(np.float32)
lengths, tilts = make_box_arrays(box0)
traj = Trajectory(positions=pos, velocities=vel,
                  types=np.ones(n_cells, dtype=np.int32),
                  timesteps=np.arange(n_frames, dtype=np.float32),
                  box_matrix=box0, box_lengths=lengths, box_tilts=tilts,
                  dt_ps=dt_ps, box_matrices=boxes.astype(np.float32))
calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)

# mode columns m = 1..12 through both engines
orders = np.arange(1, 13)
m = np.zeros((orders.size, 3))
m[:, 0] = orders

# --- 1. fixed-cell frame-0 mapping: k = 2π m / L0 ------------------------
kv = (2 * np.pi / L0) * m.astype(np.float32)
sed_fix = calc.calculate(np.linalg.norm(kv, axis=1), kv)

# --- 2. fractional anchor at the same Miller points ----------------------
sed_npt = calc.calculate_npt(m)

pos_rows = sed_fix.freqs >= 0
f_pos = sed_fix.freqs[pos_rows]
I_fix = sed_fix.intensity[pos_rows]                      # (n_freq+, n_m)
I_npt = sed_npt.intensity[pos_rows]

col = mode_m - 1
peak_fix, peak_npt = I_fix[:, col].max(), I_npt[:, col].max()
nbr_fix = max(I_fix[:, col - 1].max(), I_fix[:, col + 1].max())
nbr_npt = max(I_npt[:, col - 1].max(), I_npt[:, col + 1].max())
print(f"captured peak at m={mode_m}:  fixed-cell {peak_fix:.3e}   "
      f"NPT anchor {peak_npt:.3e}  ({peak_npt / peak_fix:.2f}x)")
print(f"worst neighbor-mode leak:   fixed-cell {nbr_fix / peak_fix:.1%}   "
      f"NPT anchor {nbr_npt / peak_npt:.1%}")
assert peak_npt > 1.2 * peak_fix
assert nbr_npt < 0.05 * peak_npt

fig, axes = plt.subplots(1, 2, figsize=(11, 4.5), sharey=True)
for ax, I, title in ((axes[0], I_fix, "fixed cell, frame-0 k-mapping"),
                     (axes[1], I_npt, "NPT fractional anchor")):
    pcm = ax.pcolormesh(orders, f_pos, np.sqrt(I / peak_npt),
                        shading='nearest', cmap='inferno',
                        vmin=0, vmax=1)
    ax.axhline(nu_thz, color='w', ls=':', lw=0.8)
    ax.axvline(mode_m, color='w', ls=':', lw=0.8)
    ax.set_xlabel("mode m")
    ax.set_title(title)
axes[0].set_ylabel("ν (THz)")
axes[0].set_ylim(0, 10)
fig.colorbar(pcm, ax=axes, label='√(I / peak)')
fig.savefig(OUT / "npt_vs_fixed.png", dpi=200, bbox_inches='tight')
plt.close(fig)
print(f"wrote {OUT / 'npt_vs_fixed.png'}")

# --- 3. sweep forms: the spectrum never leaves the device ----------------
# calculate_npt_browse returns only the ω-filtered intensity planes, and
# calculate_npt_peaks only the top-n (frequency, height, width) triplets
# per k — the NPT analogs of the fixed-cell browse/peaks sweeps (pass
# mesh=make_mesh(...) to run either across a (t, a, k) device mesh).
freqs_b, inten_b, _, k_cart = calc.calculate_npt_browse(m)
pf, pi, pw, _ = calc.calculate_npt_peaks(m, n_peaks=1)
assert np.allclose(inten_b, I_npt, rtol=1e-5, atol=1e-8 * I_npt.max())
print(f"browse planes: {inten_b.shape} at k_cart magnitudes "
      f"{np.linalg.norm(k_cart, axis=1).round(3)[:3]}... (2π/Å)")
print(f"peak surface: ridden mode m={mode_m} found at "
      f"{pf[0, col]:.2f} THz (built at {nu_thz:.1f})")
assert abs(pf[0, col] - nu_thz) < 0.5
