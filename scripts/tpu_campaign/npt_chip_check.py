"""TPU validation + throughput of the NPT (fractional anchor) sweep forms.

Round-5 rule: every new jitted path is spot-checked on the real chip
against a float64 host oracle (the CPU tests can pass while bf16 MXU
passes lose digits on hardware — see .claude/skills/verify/SKILL.md).
Runs calculate_npt_browse / calculate_npt_peaks on a breathing-cell
thermal slab, checks the browse plane against the f64 NPT oracle
(exp(2πi m·s̄), s = h(t)⁻¹ r), records warm rates, and writes
npt_chip_check.json.
"""
import json
import time
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "npt_chip_check.json"


def main():
    import jax
    print("devices:", jax.devices())
    from psa_tpu.core.calculator import SEDCalculator
    from psa_tpu.core.trajectory import Trajectory, make_box_arrays

    # breathing orthorhombic slab: 4,096 atoms x 1,024 frames, ±2% volume
    n_side, n_t, a0 = 16, 1_024, 2.5       # 16^3 = 4,096 atoms
    n_atoms = n_side ** 3
    rng = np.random.default_rng(17)
    L0 = n_side * a0
    lam = 1.0 + 0.02 * np.sin(np.linspace(0, 4 * np.pi, n_t))
    g = (np.arange(n_side) + 0.5) / n_side
    s0 = np.stack(np.meshgrid(g, g, g, indexing='ij'),
                  axis=-1).reshape(-1, 3)                       # (N, 3)
    s_noise = rng.normal(0, 0.02 / L0, (n_t, n_atoms, 3))
    s = s0[None] + s_noise                                      # (T, N, 3)
    boxes = lam[:, None, None] * np.diag([L0, L0, L0])[None]
    pos = (s * (lam[:, None, None] * L0)).astype(np.float32)
    vel = rng.normal(0, 1.0, (n_t, n_atoms, 3)).astype(np.float32)
    lengths, tilts = make_box_arrays(boxes[0].astype(np.float32))
    traj = Trajectory(positions=pos, velocities=vel,
                      types=np.ones(n_atoms, dtype=np.int32),
                      timesteps=np.arange(n_t, dtype=np.float32),
                      box_matrix=boxes[0].astype(np.float32),
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.01,
                      box_matrices=boxes.astype(np.float32))
    calc = SEDCalculator(traj, nx=n_side, ny=n_side, nz=n_side)

    n_k = 256
    m = np.zeros((n_k, 3))
    m[:, 0] = np.linspace(1, n_side // 2, n_k)       # Γ→X line, fractional

    t0 = time.time()
    freqs, inten, _, k_cart = calc.calculate_npt_browse(m)
    first_s = time.time() - t0
    t0 = time.time()
    freqs, inten, _, k_cart = calc.calculate_npt_browse(m)
    browse_warm = time.time() - t0
    t0 = time.time()
    pf, pi, pw, _ = calc.calculate_npt_peaks(m, n_peaks=1)
    peaks_first = time.time() - t0
    t0 = time.time()
    pf, pi, pw, _ = calc.calculate_npt_peaks(m, n_peaks=1)
    peaks_warm = time.time() - t0

    # f64 oracle on a k subset
    sub = rng.choice(n_k, size=8, replace=False)
    hinv = np.linalg.inv(boxes)
    s64 = np.einsum('tij,taj->tai', hinv, pos.astype(np.float64))
    ph = np.exp(2j * np.pi * (m[sub] @ s64.mean(axis=0).T))     # (k, N)
    proj = np.einsum('tac,ka->tkc', vel.astype(np.float64), ph)
    orc = np.fft.fft(proj, axis=0) / n_t
    orc_int = np.sum(np.abs(orc) ** 2, axis=-1)
    mask = np.fft.fftfreq(n_t, d=0.01) >= 0
    err = float(np.abs(inten[:, sub] - orc_int[mask]).max()
                / orc_int[mask].max())
    pk_expect = freqs[np.argmax(orc_int[mask], axis=0)]
    pk_err = float(np.abs(pf[0, sub] - pk_expect).max())

    res = {
        "shape": {"n_atoms": n_atoms, "n_t": n_t, "n_k": n_k},
        "device": str(jax.devices()[0]),
        "browse_first_s": round(first_s, 2),
        "browse_warm_s": round(browse_warm, 3),
        "browse_kpts_per_s": round(n_k / browse_warm, 1),
        "peaks_first_s": round(peaks_first, 2),
        "peaks_warm_s": round(peaks_warm, 3),
        "peaks_kpts_per_s": round(n_k / peaks_warm, 1),
        "browse_rel_err_vs_f64": err,
        "peak_bin_max_abs_err_thz": pk_err,
    }
    print(json.dumps(res, indent=1))
    assert err < 2e-5, f"chip browse plane off the f64 oracle: {err}"
    assert pk_err < 1e-6, f"chip peak bins off the oracle: {pk_err}"
    OUT.write_text(json.dumps(res, indent=1) + "\n")
    print(f"wrote {OUT}")


if __name__ == '__main__':
    main()
