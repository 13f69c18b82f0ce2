#!/usr/bin/env python
"""TPU check: restructured gridded_kgrid_spectrum (device-built weights,
cells-outer loop shared with the browse path, gy-chunked accumulators).

Validates on hardware that (a) the multi-cell-chunk path produces the same
spectrum as the direct engine (cross-engine checksum), and (b) the forced
multi-chunk configuration is not pathologically slower than single-chunk —
the old structure rebuilt host weights once per (t-chunk x cell-chunk),
multiplying the dominant host cost by n_t/t_chunk.

Workload: N=1e5 Si-like sites, n_t=2500, 50x50 grid (small enough that the
full complex readback does not dominate on the tunnel).
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, '/root/repo')
from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays


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
    nx = max(1, side)
    calc = SEDCalculator(traj, nx=nx, ny=nx, nz=nx)

    g = 50
    _, k_vecs, shape = calc.get_k_grid('xy', (-5.0, 5.0), (-5.0, 5.0), g, g)
    out = {"config": {"atoms": n_atoms, "steps": n_t, "grid": g}}

    t0 = time.time()
    sed_single = calc.calculate_gridded(k_vecs, shape)
    out["gridded_single_first_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    sed_single = calc.calculate_gridded(k_vecs, shape)
    warm = time.time() - t0
    out["gridded_single_warm_s"] = round(warm, 2)
    out["gridded_single_kps"] = round(g * g / warm, 1)
    log(f"single-chunk: {warm:.2f}s warm ({g*g/warm:.0f} k-points/s)")

    # forced multi-chunk on every axis
    t0 = time.time()
    sed_multi = calc.calculate_gridded(k_vecs, shape, cell_chunk=17,
                                       gy_chunk=19, t_chunk=700)
    out["gridded_multi_first_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    sed_multi = calc.calculate_gridded(k_vecs, shape, cell_chunk=17,
                                       gy_chunk=19, t_chunk=700)
    warm_m = time.time() - t0
    out["gridded_multi_warm_s"] = round(warm_m, 2)
    out["gridded_multi_kps"] = round(g * g / warm_m, 1)
    log(f"multi-chunk: {warm_m:.2f}s warm ({g*g/warm_m:.0f} k-points/s)")

    rel = (np.max(np.abs(sed_multi.sed - sed_single.sed))
           / np.max(np.abs(sed_single.sed)))
    out["multi_vs_single_rel"] = float(rel)
    log(f"multi vs single rel: {rel:.2e}")

    # cross-engine checksum on a k subsample (direct engine readback is
    # d2h-bound; 64 k-points keep it cheap)
    sub = np.linspace(0, g * g - 1, 64).astype(int)
    sed_direct = calc.calculate(np.zeros(len(sub)), k_vecs[sub])
    rel_d = (np.max(np.abs(sed_single.sed[:, sub, :] - sed_direct.sed))
             / np.max(np.abs(sed_direct.sed)))
    out["gridded_vs_direct_rel"] = float(rel_d)
    log(f"gridded vs direct rel (64-pt subsample): {rel_d:.2e}")

    with open('/root/repo/scripts/tpu_campaign/gridded_spectrum_v2.json',
              'w') as f:
        json.dump(out, f, indent=1)
    log("done")


if __name__ == '__main__':
    main()
