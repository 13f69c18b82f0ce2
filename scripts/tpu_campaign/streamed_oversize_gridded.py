#!/usr/bin/env python
"""Out-of-core head-to-head, gridded engine: the same beyond-HBM memmap
trajectory as streamed_oversize.py (48 GB default) swept by the streamed
NUFFT engine on one device.

The streamed gridded sweep reads the source once per gy block (sized here
so ONE block covers the grid -> exactly one full pass over the file) and
uploads per-row-chunk compact atom slabs; device residency is
O(t_superchunk) data + the (n_cells, n_t_pad, gyc) grid accumulators.
Compare k-points/s against the direct-engine numbers in
streamed_oversize_<shape>.json.

Env knobs: PSA_OC_ATOMS, PSA_OC_STEPS, PSA_OC_GRID, PSA_OC_TSC,
PSA_OC_FILE — same meanings/defaults as streamed_oversize.py.
"""
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

ATOMS = int(os.environ.get('PSA_OC_ATOMS', 200_000))
STEPS = int(os.environ.get('PSA_OC_STEPS', 20_000))
GRID = int(os.environ.get('PSA_OC_GRID', 50))
TSC = int(os.environ.get('PSA_OC_TSC', 2_000))
FILE = Path(os.environ.get('PSA_OC_FILE', '/tmp/psa_oversize_vel.npy'))
OUT = Path(__file__).parent / (
    f"streamed_oversize_gridded_{ATOMS}x{STEPS}_g{GRID}.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import signal
    from psa_tpu.utils.host_alloc import enable_arena_reuse
    log(f"arena reuse: {enable_arena_reuse()}")
    if not FILE.exists():
        sys.exit(f"{FILE} missing; run streamed_oversize.py first")

    results = {'shape': f"{ATOMS}x{STEPS}", 'grid': GRID,
               't_superchunk': TSC, 'engine': 'gridded-streamed',
               'traj_gb': round(STEPS * ATOMS * 12 / 1e9, 1)}

    def flush(*_sig):                    # phase-by-phase persistence +
        OUT.write_text(json.dumps(results, indent=1))   # SIGTERM emit
        if _sig:
            print(json.dumps(results), flush=True)
            sys.exit(1)
    signal.signal(signal.SIGTERM, flush)
    signal.signal(signal.SIGINT, flush)
    a0 = 5.43
    side = int(np.ceil((ATOMS / 8) ** (1 / 3)))
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                     axis=-1).reshape(-1, 3)
    basis = np.array([[0, 0, 0], [.25, .25, .25], [.5, .5, 0], [.75, .75, .25],
                      [.5, 0, .5], [.75, .25, .75], [0, .5, .5], [.25, .75, .75]])
    mean64 = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3)
              * a0)[:ATOMS].astype(np.float64)
    kx = np.linspace(-2 * np.pi / a0, 2 * np.pi / a0, GRID)

    import jax
    from psa_tpu.ops import gridded, spectral
    from psa_tpu.parallel import ArrayBlockSource

    log(f"devices: {jax.devices()}")
    freqs = spectral.fftfreq_thz(STEPS, 0.01)
    mask = freqs >= 0
    freq_idx = np.flatnonzero(mask).astype(np.int32)
    fkept = freqs[mask].astype(np.float32)

    plan = gridded.plan_kgrid(mean64, kx, kx, k_fixed=0.0, axes=(0, 1, 2))
    mm = np.load(FILE, mmap_mode='r')
    src = ArrayBlockSource(mm)
    n_k = GRID * GRID

    # timed sweep (includes the remote compile on a first-ever shape; the
    # persistent compile cache makes reruns pure-streaming) — peaks mode,
    # the readback-light dispersion-surface path
    t0 = time.time()
    pk = gridded.gridded_kgrid_browse(
        src, plan, freq_idx, n_peaks=2, freqs_kept=fkept,
        t_superchunk=TSC)
    dt = time.time() - t0
    results['first_run'] = {'seconds': round(dt, 1),
                            'k_points_per_sec': round(n_k / dt, 1)}
    flush()
    log(f"first run (incl compile): {n_k} k-points in {dt:.1f}s "
        f"-> {n_k / dt:.1f} k-points/s")
    results['checksum'] = float(np.sum(pk[0]) / n_k)

    t0 = time.time()
    gridded.gridded_kgrid_browse(src, plan, freq_idx, n_peaks=2,
                                 freqs_kept=fkept, t_superchunk=TSC)
    dt = time.time() - t0
    results['warm'] = {'seconds': round(dt, 1),
                       'k_points_per_sec': round(n_k / dt, 1)}
    log(f"warm: {n_k} k-points in {dt:.1f}s -> {n_k / dt:.1f} k-points/s")
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
