"""TPU validation + throughput of the instantaneous-phase engine (DSF).

Runs calculate_dsf / calculate_dsf_self on a thermally displaced Si-like
slab on the real chip, checks parity against a float64 host oracle on a
k subset, and records k-points/s.  Writes dsf_check.json.
"""
import json
import time
from pathlib import Path

import numpy as np

from _workload import make_si_calculator  # noqa: E402 (sys.path via cwd)

OUT = Path(__file__).parent / "dsf_check.json"


def main():
    n_atoms, n_t = 10_000, 2_500
    calc, side = make_si_calculator(n_atoms, n_t, seed=3)
    # displace the static sites: bounded random walk (~0.1 Å RMS) so the
    # instantaneous phases actually move
    rng = np.random.default_rng(9)
    steps = rng.standard_normal((n_t, n_atoms, 3)).astype(np.float32) * 0.02
    disp = np.cumsum(steps, axis=0)
    disp -= disp.mean(axis=0, keepdims=True)
    traj = calc.traj
    traj.positions = traj.positions + np.clip(disp, -0.5, 0.5)

    gx, gy = 16, 32
    kx = np.linspace(0.05, 2.0, gx)
    ky = np.linspace(-1.0, 1.0, gy)
    kv = np.zeros((gx * gy, 3), dtype=np.float32)
    kv[:, 0] = np.repeat(kx, gy)
    kv[:, 1] = np.tile(ky, gx)

    t0 = time.time()
    freqs, s, c_l, c_t = calc.calculate_dsf(kv, max_freq=None)
    warm_compile = time.time() - t0
    t0 = time.time()
    freqs, s, c_l, c_t = calc.calculate_dsf(kv, max_freq=None)
    warm = time.time() - t0
    rate = kv.shape[0] / warm

    # float64 oracle on a k subset
    sub = rng.choice(kv.shape[0], size=6, replace=False)
    pos64 = traj.positions.astype(np.float64)
    vel64 = traj.velocities.astype(np.float64)
    ang = np.einsum('tac,kc->tak', pos64, kv[sub].astype(np.float64))
    ph = np.exp(1j * ang)
    rho_w = np.fft.fft(ph.sum(axis=1), axis=0) / n_t
    j_w = np.fft.fft(np.einsum('tac,tak->tkc', vel64, ph), axis=0) / n_t
    mask = np.fft.fftfreq(n_t, d=calc.dt_ps) >= 0
    s_o = (np.abs(rho_w) ** 2 / n_atoms)[mask]
    ku = kv[sub] / np.linalg.norm(kv[sub], axis=1, keepdims=True)
    jl = np.einsum('tkc,kc->tk', j_w, ku)
    cl_o = (np.abs(jl) ** 2 / n_atoms)[mask]
    err_s = float(np.abs(s[:, sub] - s_o).max() / max(s_o.max(), 1e-30))
    err_cl = float(np.abs(c_l[:, sub] - cl_o).max() / max(cl_o.max(), 1e-30))

    t0 = time.time()
    _, s_s = calc.calculate_dsf_self(kv[:64])
    self_first = time.time() - t0
    t0 = time.time()
    _, s_s = calc.calculate_dsf_self(kv[:64])
    self_warm = time.time() - t0

    res = {
        'n_atoms': n_atoms, 'n_t': n_t, 'n_k': int(kv.shape[0]),
        'first_s': round(warm_compile, 2), 'warm_s': round(warm, 3),
        'k_points_per_s': round(rate, 1),
        'rel_err_S_vs_f64': err_s, 'rel_err_CL_vs_f64': err_cl,
        'self_n_k': 64, 'self_first_s': round(self_first, 2),
        'self_warm_s': round(self_warm, 3),
        'self_sum_min': float(np.asarray(s_s).sum(axis=0).min()),
    }
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res))


if __name__ == '__main__':
    main()
