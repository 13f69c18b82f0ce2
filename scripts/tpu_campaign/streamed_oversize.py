#!/usr/bin/env python
"""Out-of-core regime measurement: a trajectory EXCEEDING HBM streamed
through the mesh in time-superchunks (VERDICT r2 item 5).

Creates (once) a memmap .npy velocities file larger than a v5e's 16 GB HBM,
then runs the streamed sharded peaks sweep on the available device(s) with
prefetch on and off, recording k-points/s and the overlap efficiency.  The
trajectory never exists in host RAM as a whole: ArrayBlockSource slices the
memmap per (superchunk, shard) window.

Defaults: 200,000 atoms x 20,000 steps x f32 x 3 = 48 GB (3x HBM),
50x50 k-grid, 2,000-frame superchunks (4.8 GB device-resident per buffer).

Env knobs: PSA_OC_ATOMS, PSA_OC_STEPS, PSA_OC_GRID, PSA_OC_TSC,
PSA_OC_KCHUNK, PSA_OC_FILE (default /tmp/psa_oversize_vel.npy),
PSA_OC_PREFETCH_ONLY=1 (skip the prefetch-off pass),
PSA_OC_POOL=1 (serve the trajectory from a TiledBlockSource instead of a
memmap file: one superchunk-sized RAM pool tiled along time — identical
bytes streamed and identical device programs, but no multi-hour file prep
on hosts whose page-fault/disk bandwidth is pathologically low, like this
Firecracker host on bad days).
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
KCHUNK = int(os.environ.get('PSA_OC_KCHUNK', 1_280))
FILE = Path(os.environ.get('PSA_OC_FILE', '/tmp/psa_oversize_vel.npy'))
OUT = Path(__file__).parent / (
    f"streamed_oversize_{ATOMS}x{STEPS}_g{GRID}"
    f"{'_pool' if os.environ.get('PSA_OC_POOL') == '1' else ''}.json")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def ensure_file():
    """Fill the velocities .npy from a tiled normal pool with BUFFERED
    sequential writes (disk-speed, not RNG-speed; the SED rate is
    data-independent).  A memmap fill page-faults one 4 KB block allocation
    at a time, which this host's ext4 (strict-reservation + discard) served
    at <10 MB/s vs 259 MB/s for plain ``write``."""
    total_bytes = STEPS * ATOMS * 3 * 4
    if FILE.exists() and FILE.stat().st_size >= total_bytes:
        log(f"reusing {FILE} ({FILE.stat().st_size / 1e9:.1f} GB)")
        return
    log(f"writing {total_bytes / 1e9:.1f} GB velocities to {FILE}...")
    t0 = time.time()
    from numpy.lib.format import write_array_header_1_0
    rng = np.random.default_rng(3)
    # One small f32 pool, serialized ONCE: this host's anonymous-page faults
    # run at ~10 MB/s (kernel time), so every fresh multi-GB allocation
    # costs minutes — generate 256 frames directly in f32 and reuse the
    # same bytes for every slab.
    slab = 256
    pool = rng.standard_normal((slab, ATOMS, 3), dtype=np.float32)
    buf = memoryview(pool.tobytes())     # memoryview: slices below are 0-copy
    frame_bytes = ATOMS * 3 * 4
    with open(FILE, 'wb') as f:
        write_array_header_1_0(f, {'descr': '<f4', 'fortran_order': False,
                                   'shape': (STEPS, ATOMS, 3)})
        for t0_i in range(0, STEPS, slab):
            t1_i = min(t0_i + slab, STEPS)
            f.write(buf[:(t1_i - t0_i) * frame_bytes])
            if (t0_i // slab) % 16 == 0:
                log(f"  {t1_i}/{STEPS} frames "
                    f"({time.time() - t0:.0f}s elapsed)")
    log(f"  written in {time.time() - t0:.0f}s")


def main():
    import signal
    from psa_tpu.utils.host_alloc import enable_arena_reuse
    log(f"arena reuse: {enable_arena_reuse()}")
    pool_mode = os.environ.get('PSA_OC_POOL') == '1'
    if not pool_mode:
        ensure_file()

    # bench.py's robustness contract, here too: every completed phase is
    # persisted immediately, and SIGTERM/SIGINT flush what exists before
    # dying — a driver timeout still yields numbers.
    results = {}

    def flush(*_sig):
        if results:
            OUT.write_text(json.dumps(results, indent=1))
            print(json.dumps(results), flush=True)
        if _sig:
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
    kx = np.linspace(-2 * np.pi / a0, 2 * np.pi / a0, GRID, dtype=np.float32)
    k_vecs = np.stack([np.repeat(kx, GRID), np.tile(kx, GRID),
                       np.zeros(GRID * GRID, np.float32)], axis=1)
    n_k = k_vecs.shape[0]

    import jax
    from psa_tpu.ops import spectral
    from psa_tpu.parallel import (ArrayBlockSource, TiledBlockSource,
                                  make_mesh, sharded_sed_spectrum)

    log(f"devices: {jax.devices()}")
    n_dev = len(jax.devices())
    mesh = make_mesh(shape=(1, 1, n_dev))
    freqs = spectral.fftfreq_thz(STEPS, 0.01)
    mask = freqs >= 0
    freq_idx = np.flatnonzero(mask).astype(np.int32)
    fkept = freqs[mask].astype(np.float32)

    if pool_mode:
        t0 = time.time()
        pool = np.random.default_rng(3).standard_normal(
            (TSC, ATOMS, 3), dtype=np.float32)
        log(f"pool {pool.nbytes / 1e9:.1f} GB built in {time.time() - t0:.0f}s")
        src = TiledBlockSource(pool, n_frames=STEPS)
    else:
        mm = np.load(FILE, mmap_mode='r')
        src = ArrayBlockSource(mm)
    results.update({'shape': f"{ATOMS}x{STEPS}", 'grid': GRID,
                    't_superchunk': TSC, 'k_chunk': KCHUNK,
                    'source': 'tiled_pool' if pool_mode else 'memmap_file',
                    'traj_gb': round(STEPS * ATOMS * 12 / 1e9, 1),
                    'n_devices': n_dev})

    # Warmup: compile every program (prefetch on/off share the same
    # compiled set — prefetch is host-side) on the first k-chunk so the
    # timed passes measure streaming, not the remote compile service.
    t0 = time.time()
    sharded_sed_spectrum(mesh, src, mean64, k_vecs[:KCHUNK],
                         t_superchunk=TSC, freq_indices=freq_idx,
                         n_peaks=2, peak_freqs_thz=fkept)
    results['warmup_incl_compile_s'] = round(time.time() - t0, 1)
    log(f"warmup (compile + one chunk): {results['warmup_incl_compile_s']}s")
    flush()

    modes = [('prefetch_on', True)]
    if os.environ.get('PSA_OC_PREFETCH_ONLY') != '1':
        modes.append(('prefetch_off', False))
    for name, pf in modes:
        t0 = time.time()
        done = 0
        for s in range(0, n_k, KCHUNK):
            e = min(s + KCHUNK, n_k)
            pfreq, ph, pw = sharded_sed_spectrum(
                mesh, src, mean64, k_vecs[s:e], t_superchunk=TSC,
                prefetch=pf, freq_indices=freq_idx, n_peaks=2,
                peak_freqs_thz=fkept)
            done += e - s
            log(f"  [{name}] chunk {s // KCHUNK + 1}: {done}/{n_k} "
                f"({time.time() - t0:.0f}s elapsed)")
        dt = time.time() - t0
        results[name] = {'seconds': round(dt, 1),
                         'k_points_per_sec': round(n_k / dt, 1)}
        flush()
        log(f"{name}: {n_k} k-points in {dt:.1f}s "
            f"-> {n_k / dt:.1f} k-points/s")
    if 'prefetch_off' in results:
        results['overlap_speedup'] = round(
            results['prefetch_off']['seconds']
            / results['prefetch_on']['seconds'], 3)
    OUT.write_text(json.dumps(results, indent=1))
    print(json.dumps(results))


if __name__ == '__main__':
    main()
