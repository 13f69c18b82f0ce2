#!/usr/bin/env python
"""TPU campaign phase 3: fused gridded browse vs direct browse.

Phase 2 showed the gridded engine d2h-bound (43-196 k-points/s) because it
shipped its full pre-FFT signal to host.  gridded_kgrid_browse keeps the
signal on device; this measures whether the ~Gx/12 FLOP cut now shows.
Same workload as phase 2 (N=1e5, n_t=2500).
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
    calc = SEDCalculator(traj, nx=1, ny=1, nz=1, max_device_bytes=int(13e9))

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
        with open('/root/repo/scripts/tpu_campaign/gridded_browse.json', 'w') as f:
            json.dump(results, f, indent=1)

    for g in (100, 200):
        _, kv, shape = calc.get_k_grid('xy', (-2 * np.pi / a0, 2 * np.pi / a0),
                                       (-2 * np.pi / a0, 2 * np.pi / a0), g, g)
        log(f"=== grid {g}x{g} ===")
        timed(f"gridded_browse_{g}", lambda: calc.calculate_kgrid_browse(
            kv, engine='gridded', k_grid_shape=shape), g * g)
        timed(f"direct_browse_{g}", lambda: calc.calculate_kgrid_browse(
            kv, k_chunk_size=1280), g * g)

    log("WROTE gridded_browse.json")


if __name__ == '__main__':
    main()
