"""TPU validation + throughput of the liquid-observable family.

Runs calculate_sk / calculate_isf / calculate_isf_self / calculate_msd /
calculate_vacf / calculate_rdf on the thermally displaced Si-like slab
(same shape as dsf_check.py: N=1e4, n_t=2500) on the real chip, checks
parity against float64 host oracles on subsets, and records warm
timings.  Writes liquid_check.json.
"""
import json
import time
from pathlib import Path

import numpy as np

from _workload import make_si_calculator  # noqa: E402 (sys.path via cwd)

OUT = Path(__file__).parent / "liquid_check.json"


def timed(fn, *args, **kw):
    t0 = time.time()
    out = fn(*args, **kw)
    first = time.time() - t0
    t0 = time.time()
    out = fn(*args, **kw)
    return out, first, time.time() - t0


def main():
    n_atoms, n_t = 10_000, 2_500
    calc, side = make_si_calculator(n_atoms, n_t, seed=3)
    rng = np.random.default_rng(9)
    steps = rng.standard_normal((n_t, n_atoms, 3)).astype(np.float32) * 0.02
    disp = np.cumsum(steps, axis=0)
    disp -= disp.mean(axis=0, keepdims=True)
    traj = calc.traj
    traj.positions = traj.positions + np.clip(disp, -0.5, 0.5)

    gx, gy = 16, 32
    kv = np.zeros((gx * gy, 3), dtype=np.float32)
    kv[:, 0] = np.repeat(np.linspace(0.05, 2.0, gx), gy)
    kv[:, 1] = np.tile(np.linspace(-1.0, 1.0, gy), gx)
    n_k = kv.shape[0]
    res = {"n_atoms": n_atoms, "n_t": n_t, "n_k": n_k}

    # --- S(k): density-only accumulate, no FFT -----------------------------
    sk, first, warm = timed(calc.calculate_sk, kv)
    res.update(sk_first_s=round(first, 2), sk_warm_s=round(warm, 3),
               sk_kpoints_per_s=round(n_k / warm, 1))
    sub = rng.choice(n_k, size=5, replace=False)
    ang = np.einsum('tac,kc->tak', traj.positions.astype(np.float64),
                    kv[sub].astype(np.float64))
    rho = np.exp(1j * ang).sum(axis=1)
    sk_o = (np.abs(rho) ** 2).mean(axis=0) / n_atoms
    res["sk_rel_err_vs_f64"] = float(
        np.abs(sk[sub] - sk_o).max() / max(sk_o.max(), 1e-30))

    # --- coherent ISF over the same accumulate -----------------------------
    (lags, f), first, warm = timed(calc.calculate_isf, kv, n_lags=256)
    res.update(isf_first_s=round(first, 2), isf_warm_s=round(warm, 3),
               isf_kpoints_per_s=round(n_k / warm, 1))
    res["isf_zero_lag_vs_sk"] = float(
        np.abs(f[0] - sk).max() / max(sk.max(), 1e-30))

    # --- self ISF (per-atom FFT) on a k subset ------------------------------
    kv64 = kv[:64]
    (lags_s, f_s), first, warm = timed(calc.calculate_isf_self, kv64,
                                       n_lags=256)
    res.update(isf_self_first_s=round(first, 2),
               isf_self_warm_s=round(warm, 3),
               isf_self_kpoints_per_s=round(64 / warm, 1),
               isf_self_zero_lag_err=float(np.abs(f_s[0] - 1.0).max()))

    # --- MSD / VACF ---------------------------------------------------------
    (lm, msd), first, warm = timed(calc.calculate_msd, n_lags=512)
    res.update(msd_first_s=round(first, 2), msd_warm_s=round(warm, 3))
    (lv, vacf), first, warm = timed(calc.calculate_vacf, n_lags=512)
    res.update(vacf_first_s=round(first, 2), vacf_warm_s=round(warm, 3))
    # oracle on an atom subset
    idx = rng.choice(n_atoms, size=32, replace=False)
    p64 = traj.positions[:, idx].astype(np.float64)
    msd_o = np.zeros(8)
    for tau in range(8):
        d = p64[tau:] - p64[:n_t - tau]
        msd_o[tau] = (d ** 2).sum(-1).mean(0).mean()
    (_, msd_sub) = calc.calculate_msd(basis_atom_indices=idx.tolist(),
                                      n_lags=8)
    res["msd_rel_err_vs_f64"] = float(
        np.abs(msd_sub[0] - msd_o).max() / max(msd_o.max(), 1e-30))
    v0 = float((traj.velocities.astype(np.float64) ** 2).sum(-1).mean())
    res["vacf_zero_lag_rel_err"] = float(abs(vacf[0, 0] - v0) / v0)

    # --- g(r) ----------------------------------------------------------------
    (r, g), first, warm = timed(calc.calculate_rdf, n_bins=200,
                                max_frames=16)
    res.update(rdf_first_s=round(first, 2), rdf_warm_s=round(warm, 3),
               rdf_pair_grate=round(16 * n_atoms * n_atoms / warm / 1e9, 2))
    nz = np.flatnonzero(g > 0)
    res["rdf_min_pair_r"] = float(r[nz[0]]) if nz.size else None
    res["rdf_first_peak_r"] = float(r[np.argmax(g)])

    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
