"""Exact vs incremental vs FACTORED instantaneous-phase engines on the chip.

Round-5 VERDICT item 4: the k-axis factored engine
(ops/instantaneous.factor_k_chunk + _factored_phasors) should beat the
round-4 exact engine on the DSF family — target ≥2× the 288.6 k-points/s
round-4 DSF warm rate — while holding ≤1e-6 parity vs the f64 host oracle.
Times calculate_dsf / calculate_sk / calculate_dsf_self under all three
engines on two k-set shapes:

  * the round-4 16×32 snapped k-GRID (chunks exercise the grid-slice /
    per-axis detectors), and
  * a 512-point consecutive k-LINE (the anchor ⊕ delta fast path).

Writes phase_engine_r5.json.
"""
import json
import time
from pathlib import Path

import numpy as np

from _workload import make_si_calculator  # noqa: E402 (sys.path via cwd)

OUT = Path(__file__).parent / "phase_engine_r5.json"


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


def k_grid(traj):
    from psa_tpu.ops.instantaneous import nearest_commensurate
    gx, gy = 16, 32
    kx = np.linspace(0.11, 2.0, gx)
    ky = np.linspace(-1.0, 1.0, gy)
    kv = np.zeros((gx * gy, 3), dtype=np.float32)
    kv[:, 0] = np.repeat(kx, gy)
    kv[:, 1] = np.tile(ky, gx)
    kv = nearest_commensurate(kv, traj.box_matrix)
    return kv[np.linalg.norm(kv, axis=1) > 1e-6]


def k_line(traj, n=512):
    box = np.asarray(traj.box_matrix, dtype=np.float64)
    step = 2 * np.pi / box[0, 0]
    return np.outer(np.arange(1, n + 1) * step, [1, 0, 0]).astype(np.float32)


def main():
    from psa_tpu.core.calculator import SEDCalculator
    from psa_tpu.ops.instantaneous import factor_k_chunk

    n_atoms, n_t = 10_000, 2_500
    traj, side = thermal_walk_traj(n_atoms, n_t)
    res = {'n_atoms': n_atoms, 'n_t': n_t}

    for shape_name, kv in (('grid', k_grid(traj)), ('line', k_line(traj))):
        n_k = kv.shape[0]
        out = factor_k_chunk(kv[:512], traj.box_matrix)
        rng = np.random.default_rng(11)
        sub = rng.choice(n_k, size=6, replace=False)
        s_o, cl_o = f64_planes(traj, kv[sub], traj.dt_ps)
        shape_res = {'n_k': int(n_k),
                     'factorable': out is not None,
                     'base_columns': None if out is None
                     else int(out[0][0].shape[0] + out[0][2].shape[0]),
                     'product_columns': None if out is None
                     else int(out[0][0].shape[0] * out[0][2].shape[0])}
        for mode in ('exact', 'factored', 'incremental'):
            calc = SEDCalculator(traj, nx=side, ny=side, nz=side,
                                 phase_mode=mode)
            t0 = time.time()
            _, s, c_l, _ = calc.calculate_dsf(kv)
            first = time.time() - t0
            t0 = time.time()
            _, s, c_l, _ = calc.calculate_dsf(kv)
            warm = time.time() - t0
            err_s = float(np.abs(s[:, sub] - s_o).max()
                          / max(s_o.max(), 1e-30))
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

            shape_res[mode] = {
                'dsf_first_s': round(first, 2),
                'dsf_warm_s': round(warm, 3),
                'k_points_per_s': round(n_k / warm, 1),
                'rel_err_S_vs_f64': err_s, 'rel_err_CL_vs_f64': err_cl,
                'sk_first_s': round(sk_first, 2),
                'sk_warm_s': round(sk_warm, 3),
                'sk_checksum': float(np.asarray(sk).sum()),
                'self_first_s': round(self_first, 2),
                'self_warm_s': round(self_warm, 3),
                'self_sum_min': float(np.asarray(s_s).sum(axis=0).min()),
            }
            print(shape_name, mode, json.dumps(shape_res[mode]), flush=True)
        for m in ('factored', 'incremental'):
            shape_res[f'speedup_dsf_{m}'] = round(
                shape_res['exact']['dsf_warm_s'] / shape_res[m]['dsf_warm_s'], 2)
            shape_res[f'speedup_sk_{m}'] = round(
                shape_res['exact']['sk_warm_s'] / shape_res[m]['sk_warm_s'], 2)
            shape_res[f'speedup_self_{m}'] = round(
                shape_res['exact']['self_warm_s']
                / shape_res[m]['self_warm_s'], 2)
        res[shape_name] = shape_res
        OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps({k: {kk: vv for kk, vv in v.items()
                          if kk.startswith('speedup')}
                      for k, v in res.items() if isinstance(v, dict)}))


if __name__ == '__main__':
    main()
