"""End-to-end readback-size study at the pod browse shape (one chip).

Same workload as stage_profile.py (N=1e5, n_t=2500, 200^2, parity), driven
through the PUBLIC SEDCalculator paths:

    browse           — calculate_kgrid_browse (full omega>=0 planes to host)
    browse_maxfreq   — same with max_freq keeping ~25% of rows
    peaks            — calculate_kgrid_peaks n_peaks=3 (3*3*K floats to host)

Device compute is identical for all three (stage_profile.json: 4.63 s at
this shape); differences are pure readback economics.

Writes peaks_endtoend.json next to this file.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument('--atoms', type=int, default=100_000)
    ap.add_argument('--steps', type=int, default=2_500)
    ap.add_argument('--grid', type=int, default=200)
    ap.add_argument('--block', type=int, default=2048)
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    from psa_tpu.core.calculator import SEDCalculator
    from psa_tpu.core.trajectory import Trajectory, make_box_arrays

    rng = np.random.default_rng(0)
    n_t, n_atoms, grid = args.steps, args.atoms, args.grid
    n_k = grid * grid
    a0 = 5.43
    side = int(np.ceil((n_atoms / 8) ** (1 / 3)))
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                     axis=-1).reshape(-1, 3)
    basis = np.array([[0, 0, 0], [.25, .25, .25], [.5, .5, 0], [.75, .75, .25],
                      [.5, 0, .5], [.75, .25, .75], [0, .5, .5], [.25, .75, .75]])
    mean64 = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a0)[:n_atoms]
    velocities = rng.standard_normal((n_t, n_atoms, 3), dtype=np.float32)
    positions = np.broadcast_to(mean64.astype(np.float32), (n_t, n_atoms, 3))
    box = np.diag([float(np.max(mean64)) + a0] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    traj = Trajectory(positions, velocities, np.ones(n_atoms, dtype=np.int32),
                      np.arange(n_t, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)
    calc = SEDCalculator(traj, nx=1, ny=1, nz=1, precision='parity',
                         max_device_bytes=int(13e9))

    kx = np.linspace(-2 * np.pi / a0, 2 * np.pi / a0, grid, dtype=np.float32)
    k_vectors = np.stack([np.repeat(kx, grid), np.tile(kx, grid),
                          np.zeros(n_k, np.float32)], axis=1)
    nyq = 1.0 / (2 * 0.01)

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        first = time.time() - t0
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        bytes_back = sum(np.asarray(o).nbytes for o in out
                         if isinstance(o, np.ndarray))
        print(f"{name:16s} first {first:7.1f}s  warm {best:7.2f}s "
              f"({n_k / best:8.1f} k-points/s)  readback {bytes_back / 1e6:7.1f} MB",
              flush=True)
        return {'first_s': first, 'warm_s': best, 'kps': n_k / best,
                'readback_mb': bytes_back / 1e6}

    res = {'config': vars(args)}
    res['browse'] = timed('browse', lambda: calc.calculate_kgrid_browse(
        k_vectors, k_chunk_size=args.block))
    res['browse_maxfreq'] = timed('browse_maxfreq',
                                  lambda: calc.calculate_kgrid_browse(
                                      k_vectors, k_chunk_size=args.block,
                                      max_freq=nyq / 4))
    res['peaks'] = timed('peaks', lambda: calc.calculate_kgrid_peaks(
        k_vectors, n_peaks=3, k_chunk_size=args.block))

    print(json.dumps(res, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'peaks_endtoend.json')
    with open(out, 'w') as f:
        json.dump(res, f, indent=2)
    print(f"wrote {out}")


if __name__ == '__main__':
    main()
