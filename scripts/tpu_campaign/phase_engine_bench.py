"""Exact vs incremental instantaneous-phase engine on the real chip.

Round-4 VERDICT item 2: the anchored incremental engine
(ops/instantaneous._incremental_phasors) must be ≥3× the exact
double-single path at the dsf_check shape while holding ≤1e-6 parity vs
the f64 host oracle.  This script times calculate_dsf / calculate_sk /
calculate_isf / calculate_dsf_self under BOTH engines on identical
box-commensurate k-sets and records parity for each.  Writes
phase_engine.json.
"""
import json
import time
from pathlib import Path

import numpy as np

from _workload import make_si_calculator  # noqa: E402 (sys.path via cwd)

OUT = Path(__file__).parent / "phase_engine.json"


def thermal_walk_traj(n_atoms, n_t, seed=3):
    calc, side = make_si_calculator(n_atoms, n_t, seed=seed)
    rng = np.random.default_rng(9)
    steps = rng.standard_normal((n_t, n_atoms, 3)).astype(np.float32) * 0.02
    disp = np.cumsum(steps, axis=0)
    disp -= disp.mean(axis=0, keepdims=True)
    calc.traj.positions = calc.traj.positions + np.clip(disp, -0.5, 0.5)
    return calc.traj, side


def f64_planes(traj, kv, dt_ps):
    n_t, n_atoms = traj.positions.shape[:2]
    ang = np.einsum('tac,kc->tak', traj.positions.astype(np.float64),
                    kv.astype(np.float64))
    ph = np.exp(1j * ang)
    rho_w = np.fft.fft(ph.sum(axis=1), axis=0) / n_t
    j_w = np.fft.fft(np.einsum('tac,tak->tkc',
                               traj.velocities.astype(np.float64), ph),
                     axis=0) / n_t
    mask = np.fft.fftfreq(n_t, d=dt_ps) >= 0
    s_o = (np.abs(rho_w) ** 2 / n_atoms)[mask]
    ku = kv / np.linalg.norm(kv, axis=1, keepdims=True)
    jl = np.einsum('tkc,kc->tk', j_w, ku)
    cl_o = (np.abs(jl) ** 2 / n_atoms)[mask]
    return s_o, cl_o


def main():
    from psa_tpu.core.calculator import SEDCalculator
    from psa_tpu.ops.instantaneous import nearest_commensurate

    n_atoms, n_t = 10_000, 2_500
    traj, side = thermal_walk_traj(n_atoms, n_t)

    gx, gy = 16, 32
    kx = np.linspace(0.11, 2.0, gx)
    ky = np.linspace(-1.0, 1.0, gy)
    kv = np.zeros((gx * gy, 3), dtype=np.float32)
    kv[:, 0] = np.repeat(kx, gy)
    kv[:, 1] = np.tile(ky, gx)
    kv = nearest_commensurate(kv, traj.box_matrix)
    kv = kv[np.linalg.norm(kv, axis=1) > 1e-6]
    n_k = kv.shape[0]

    rng = np.random.default_rng(11)
    sub = rng.choice(n_k, size=6, replace=False)
    s_o, cl_o = f64_planes(traj, kv[sub], traj.dt_ps)

    res = {'n_atoms': n_atoms, 'n_t': n_t, 'n_k': int(n_k)}
    for mode in ('exact', 'incremental'):
        calc = SEDCalculator(traj, nx=side, ny=side, nz=side,
                             phase_mode=mode)
        t0 = time.time()
        _, s, c_l, _ = calc.calculate_dsf(kv)
        first = time.time() - t0
        t0 = time.time()
        _, s, c_l, _ = calc.calculate_dsf(kv)
        warm = time.time() - t0
        err_s = float(np.abs(s[:, sub] - s_o).max() / max(s_o.max(), 1e-30))
        err_cl = float(np.abs(c_l[:, sub] - cl_o).max()
                       / max(cl_o.max(), 1e-30))

        t0 = time.time()
        sk = calc.calculate_sk(kv)
        sk_first = time.time() - t0
        t0 = time.time()
        sk = calc.calculate_sk(kv)
        sk_warm = time.time() - t0

        t0 = time.time()
        _, s_s = calc.calculate_dsf_self(kv[:64])
        self_first = time.time() - t0
        t0 = time.time()
        _, s_s = calc.calculate_dsf_self(kv[:64])
        self_warm = time.time() - t0

        res[mode] = {
            'dsf_first_s': round(first, 2), 'dsf_warm_s': round(warm, 3),
            'k_points_per_s': round(n_k / warm, 1),
            'rel_err_S_vs_f64': err_s, 'rel_err_CL_vs_f64': err_cl,
            'sk_first_s': round(sk_first, 2),
            'sk_warm_s': round(sk_warm, 3),
            'sk_checksum': float(np.asarray(sk).sum()),
            'self_first_s': round(self_first, 2),
            'self_warm_s': round(self_warm, 3),
            'self_sum_min': float(np.asarray(s_s).sum(axis=0).min()),
        }
        print(mode, json.dumps(res[mode]))

    res['speedup_dsf'] = round(res['exact']['dsf_warm_s']
                               / res['incremental']['dsf_warm_s'], 2)
    res['speedup_self'] = round(res['exact']['self_warm_s']
                                / res['incremental']['self_warm_s'], 2)
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps({'speedup_dsf': res['speedup_dsf'],
                      'speedup_self': res['speedup_self']}))


if __name__ == '__main__':
    main()
