#!/usr/bin/env python
"""TPU campaign phase 2b: remaining end-to-end measurements.

Phase 2a (endtoend_crossover.log) measured direct browse at 50/100/130 and
gridded at 50/100 before a gridded OOM at 130x130 (unbounded t_chunk, now
auto-bounded) poisoned the rest.  This pass measures: direct browse at
150/200, precision tiers at 100x100, incoherent two-group at 50x50, then
gridded (auto t_chunk) at 100 and 200 last.
"""
import gc
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
    types = (1 + (np.arange(n_atoms) % 2)).astype(np.int32)
    traj = Trajectory(positions, vel, types, np.arange(n_t, dtype=np.float32),
                      box_matrix=box, box_lengths=lengths, box_tilts=tilts,
                      dt_ps=0.01)
    calc = SEDCalculator(traj, nx=1, ny=1, nz=1, max_device_bytes=int(13e9))

    def kgrid(g):
        _, kv, shape = calc.get_k_grid('xy', (-2 * np.pi / a0, 2 * np.pi / a0),
                                       (-2 * np.pi / a0, 2 * np.pi / a0), g, g)
        return kv, shape

    results = {}

    def timed(label, fn, n_k):
        t0 = time.time()
        fn()
        first = time.time() - t0
        t0 = time.time()
        fn()
        warm = time.time() - t0
        kps = n_k / warm
        log(f"  {label}: warm {warm:.2f}s = {kps:.1f} k-points/s (first {first:.1f}s)")
        results[label] = round(kps, 2)
        with open('/root/repo/scripts/tpu_campaign/endtoend_part2.json', 'w') as f:
            json.dump(results, f, indent=1)

    for g in (150, 200):
        kv, shape = kgrid(g)
        timed(f"direct_browse_{g}", lambda: calc.calculate_kgrid_browse(
            kv, k_chunk_size=1280), g * g)

    kv100, shape100 = kgrid(100)
    for prec in ('balanced', 'fast'):
        calc.precision = prec
        timed(f"direct_browse_100_{prec}", lambda: calc.calculate_kgrid_browse(
            kv100, k_chunk_size=1280), 100 * 100)
    calc.precision = 'parity'

    kv50, shape50 = kgrid(50)
    timed("incoherent_2group_browse_50", lambda: calc.calculate_kgrid_browse(
        kv50, basis_atom_types=[1, 2], summation_mode='incoherent',
        k_chunk_size=1280), 50 * 50)

    for g in (100, 200):
        kv, shape = kgrid(g)
        gc.collect()
        try:
            timed(f"gridded_auto_tchunk_{g}", lambda: calc.calculate_gridded(
                kv, shape), g * g)
        except Exception as e:
            log(f"  gridded_auto_tchunk_{g} FAILED: {type(e).__name__}: {e}")
            results[f"gridded_auto_tchunk_{g}"] = None
        gc.collect()

    with open('/root/repo/scripts/tpu_campaign/endtoend_part2.json', 'w') as f:
        json.dump(results, f, indent=1)
    log("WROTE endtoend_part2.json")


if __name__ == '__main__':
    main()
