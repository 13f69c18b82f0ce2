#!/usr/bin/env python
"""TPU sweep: chunk-shape sensitivity of the fused gridded browse.

gridded_spectrum_v2 found a forced multi-chunk configuration 2.6x FASTER
than the auto single-chunk one at 50² — the batched-matmul shapes of
_pack_and_spread dominate, not chunk bookkeeping.  The fused browse shares
those kernels; if the effect holds at the 200² pod shape, the gridded
browse overtakes the direct engine.  Sweeps (cell_chunk, gy_chunk, t_chunk)
configs, warm-timed, checksum-compared against the first config.
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, '/root/repo')
from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays
from psa_tpu.ops import gridded, spectral


def log(msg):
    print(msg, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    n_atoms, n_t = 100_000, 2500
    a0 = 5.43
    side = int(np.ceil((n_atoms / 8) ** (1 / 3)))
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                     axis=-1).reshape(-1, 3)
    basis = np.array([[0, 0, 0], [.25, .25, .25], [.5, .5, 0], [.75, .75, .25],
                      [.5, 0, .5], [.75, .25, .75], [0, .5, .5], [.25, .75, .75]])
    sites = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a0)[:n_atoms]
    vel = rng.standard_normal((n_t, n_atoms, 3), dtype=np.float32)
    positions = np.broadcast_to(sites.astype(np.float32), (n_t, n_atoms, 3))
    box = np.diag([sites.max() + a0] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    traj = Trajectory(positions, vel, np.ones(n_atoms, dtype=np.int32),
                      np.arange(n_t, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)
    calc = SEDCalculator(traj, nx=side, ny=side, nz=side)

    g = 200
    _, k_vecs, shape = calc.get_k_grid('xy', (-5.0, 5.0), (-5.0, 5.0), g, g)
    kx_vals, ky_vals, k_fixed, axes = calc._detect_grid_axes(
        np.asarray(k_vecs, dtype=np.float32), shape)
    plan = gridded.plan_kgrid(calc.mean_positions64, kx_vals, ky_vals,
                              k_fixed=k_fixed, axes=axes)
    log(f"plan: n_cells={plan.n_cells} bucket={plan.bucket_size} gy={plan.gy}")
    data_dev, _, _ = calc._group_device_arrays(np.arange(n_atoms))

    freqs = spectral.fftfreq_thz(n_t, 0.01)
    freq_idx = np.flatnonzero(freqs >= 0).astype(np.int32)

    # balanced-row layout: chunks count ROWS now (436 x 256 at this shape)
    configs = [
        {},                                                # auto baseline
        {'cell_chunk': 218, 'gy_chunk': 44},
        {'cell_chunk': 109, 'gy_chunk': 22},
        {'gy_chunk': 22},
    ]
    out = {"config": {"atoms": n_atoms, "steps": n_t, "grid": g},
           "runs": []}
    ref_sum = None
    for cfg in configs:
        name = ",".join(f"{k}={v}" for k, v in cfg.items()) or "auto"
        t0 = time.time()
        inten, _ = gridded.gridded_kgrid_browse(data_dev, plan, freq_idx,
                                                precision='parity', **cfg)
        first = time.time() - t0
        t0 = time.time()
        inten, _ = gridded.gridded_kgrid_browse(data_dev, plan, freq_idx,
                                                precision='parity', **cfg)
        warm = time.time() - t0
        s = float(np.sum(inten, dtype=np.float64))
        if ref_sum is None:
            ref_sum = s
        rel = abs(s - ref_sum) / abs(ref_sum)
        kps = g * g / warm
        out["runs"].append({"config": name, "first_s": round(first, 1),
                            "warm_s": round(warm, 2),
                            "kps": round(kps, 1), "checksum_rel": rel})
        log(f"{name}: warm {warm:.2f}s ({kps:.0f} k-points/s) "
            f"first {first:.1f}s checksum_rel {rel:.2e}")
        with open('/root/repo/scripts/tpu_campaign/'
                  'gridded_browse_chunks.json', 'w') as f:
            json.dump(out, f, indent=1)
    log("done")


if __name__ == '__main__':
    main()
