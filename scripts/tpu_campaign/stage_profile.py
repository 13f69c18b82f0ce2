"""Stage-level timing of the direct browse path on one chip.

Decomposes the fused k-grid browse into cumulative programs so stage costs
fall out by subtraction (each is a single lax.map dispatch over the same
chunk stack, checksum-fenced):

    table    — compensated angles + [cos|sin] table only
    project  — table + projection matmul (the roofline stage)
    spectrum — + time FFT + transpose (full sed_spectrum)
    browse   — + freq take + intensity reduction (full sed_grid_browse)

Usage: python scripts/tpu_campaign/stage_profile.py [--atoms N] [--steps T]
           [--grid G] [--block B] [--precision P] [--reps R]
Writes stage_profile.json next to this file.
"""
import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--atoms', type=int, default=100_000)
    ap.add_argument('--steps', type=int, default=2_500)
    ap.add_argument('--grid', type=int, default=200)
    ap.add_argument('--block', type=int, default=2048)
    ap.add_argument('--precision', default='parity')
    ap.add_argument('--reps', type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from psa_tpu.ops import spectral

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
    data = rng.standard_normal((n_t, n_atoms, 3), dtype=np.float32)
    kx = np.linspace(-2 * np.pi / a0, 2 * np.pi / a0, grid, dtype=np.float32)
    k_vectors = np.stack([np.repeat(kx, grid), np.tile(kx, grid),
                          np.zeros(n_k, np.float32)], axis=1)

    block = args.block
    n_chunks = (n_k + block - 1) // block
    k_stack = np.zeros((n_chunks, block, 3), dtype=np.float32)
    for i in range(n_chunks):
        s, e = i * block, min((i + 1) * block, n_k)
        k_stack[i, :e - s] = k_vectors[s:e]

    mp_hi, mp_lo = spectral.split_f64(mean64)
    freqs = spectral.fftfreq_thz(n_t, 0.01)
    freq_idx = np.flatnonzero(freqs >= 0).astype(np.int32)

    t0 = time.time()
    data_d = jax.device_put(data)
    hi_d = jax.device_put(mp_hi)
    lo_d = jax.device_put(mp_lo)
    ks_d = jax.device_put(k_stack)
    fi_d = jax.device_put(freq_idx)
    jax.block_until_ready((data_d, hi_d, lo_d, ks_d, fi_d))
    print(f"upload {data.nbytes/1e9:.1f} GB in {time.time()-t0:.1f}s", flush=True)

    prec = args.precision

    @functools.partial(jax.jit, static_argnames=())
    def stage_table(hi, lo, kstack):
        def one(kc):
            cs = spectral._phase_table(hi, lo, kc)
            return cs[0, 0] + cs[-1, -1]
        return jnp.sum(lax.map(one, kstack))

    @functools.partial(jax.jit, static_argnames=('precision',))
    def stage_project(dat, hi, lo, kstack, precision='parity'):
        p = spectral.resolve_precision(precision)
        def one(kc):
            cs = spectral._phase_table(hi, lo, kc)
            proj = spectral._project(dat, cs, p)
            return proj[0, 0, 0] + proj[-1, -1, -1]
        return jnp.sum(lax.map(one, kstack))

    @functools.partial(jax.jit, static_argnames=('precision',))
    def stage_spectrum(dat, hi, lo, kstack, precision='parity'):
        def one(kc):
            re, im = spectral.sed_spectrum(dat, hi, lo, kc, precision=precision)
            return re[0, 0, 0] + im[-1, -1, -1]
        return jnp.sum(lax.map(one, kstack))

    @functools.partial(jax.jit, static_argnames=('precision',))
    def stage_browse(dat, hi, lo, kstack, fi, precision='parity'):
        def one(kc):
            inten, _ = spectral.sed_grid_browse(dat, hi, lo, kc, fi,
                                                precision=precision)
            return inten[0, 0] + inten[-1, -1]
        return jnp.sum(lax.map(one, kstack))

    def run(name, fn, *fargs, **fkw):
        t0 = time.time()
        _ = float(fn(*fargs, **fkw))
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            _ = float(fn(*fargs, **fkw))
            times.append(time.time() - t0)
        best = min(times)
        print(f"{name:10s} compile {compile_s:6.1f}s   warm {best:7.3f}s "
              f"(all: {[round(t, 3) for t in times]})", flush=True)
        return best

    results = {'config': vars(args), 'n_chunks': n_chunks}
    results['table'] = run('table', stage_table, hi_d, lo_d, ks_d)
    results['project'] = run('project', stage_project, data_d, hi_d, lo_d,
                             ks_d, precision=prec)
    results['spectrum'] = run('spectrum', stage_spectrum, data_d, hi_d, lo_d,
                              ks_d, precision=prec)
    results['browse'] = run('browse', stage_browse, data_d, hi_d, lo_d, ks_d,
                            fi_d, precision=prec)

    results['delta_matmul'] = results['project'] - results['table']
    results['delta_fft_transpose'] = results['spectrum'] - results['project']
    results['delta_reduce'] = results['browse'] - results['spectrum']
    results['browse_kps'] = n_k / results['browse']
    print(json.dumps(results, indent=2))
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       'stage_profile.json')
    with open(out, 'w') as f:
        json.dump(results, f, indent=2)
    print(f"wrote {out}")


if __name__ == '__main__':
    main()
