"""Time-correlation observables: mean-squared displacement and the
velocity autocorrelation function.

The k-independent companions of the instantaneous-phase family
(ops/instantaneous.py): MSD(τ) = ⟨|r(t+τ) − r(t)|²⟩ is THE transport
observable of liquid MD (Einstein: MSD → 2·d·D·τ), and VACF(τ) =
⟨v(t)·v(t+τ)⟩ is the time-domain twin of the on-device DOS
(ops/spectral.dos_accumulate — its Fourier transform, Wiener–Khinchin).
The reference package computes neither (its scope is the harmonic SED,
reference sed_calculator.py:78-83); both are standard post-processing the
SED workflow hands off to other tools, brought on device here.

Both kernels use the FFT trick for ALL time origins at O(n log n): per
atom/component, the lagged cross sums Σ_t x(t)·x(t+τ) come from one
linear (zero-padded) autocorrelation; the MSD additionally needs only
cumulative sums of |r(t)|² (the Kneller/nMoldyn identity
MSD(τ)·(n−τ) = S1(τ) − 2·S2(τ)).  Everything stays f32 on device; the
host sees one (n_lags,) vector per atom chunk.
"""
import functools

import jax
import jax.numpy as jnp

from .instantaneous import _autocorr_fft_len

__all__ = ['msd_block', 'vacf_block', 'timecorr_chunks']


def _lagged_products(x: jnp.ndarray, n_lags: int) -> jnp.ndarray:
    """Σ_t x(t)·x(t+τ) for τ = 0…n_lags−1, per trailing axis, via rFFT
    linear autocorrelation.  x: (n_t, ...) f32 → (n_lags, ...) f32."""
    n_t = x.shape[0]
    m = _autocorr_fft_len(n_t)
    spec = jnp.fft.rfft(x, n=m, axis=0)
    power = jnp.real(spec) ** 2 + jnp.imag(spec) ** 2
    return jnp.fft.irfft(power, n=m, axis=0)[:n_lags]


def _msd_sum(x: jnp.ndarray, n_lags: int) -> jnp.ndarray:
    """Σ over atoms of the per-atom MSD; x: (n_t, A, 3), zero rows inert.

    (n_t−τ)·MSD = S1(τ) − 2·S2(τ) with S2 the FFT autocorrelation of r and
    S1(τ) = Σ_{t<n_t−τ} |r(t)|² + Σ_{t≥τ} |r(t)|² from two cumulative-sum
    lookups (the Kneller/nMoldyn identity)."""
    n_t = x.shape[0]
    # Per-atom time-mean centering: MSD is exactly invariant under a
    # constant shift, but the f32 S1 − 2·S2 identity cancels
    # catastrophically when |r| is large (measured: +1000 Å offset →
    # 3× error at lag 1; the Si slab's absolute coordinates alone cost
    # 1.8%).  Centering bounds |x| by the displacement scale.
    x = x - jnp.mean(x, axis=0, keepdims=True)
    s2 = _lagged_products(x, n_lags).sum(axis=-1)             # (n_lags, A)
    d = (x ** 2).sum(axis=-1)                                 # (n_t, A)
    c = jnp.concatenate([jnp.zeros((1, d.shape[1]), d.dtype),
                         jnp.cumsum(d, axis=0)])              # (n_t+1, A)
    taus = jnp.arange(n_lags)
    s1 = c[n_t - taus] + (c[n_t][None, :] - c[taus])          # (n_lags, A)
    counts = (n_t - taus).astype(jnp.float32)
    return ((s1 - 2.0 * s2).sum(axis=1) / counts).astype(jnp.float32)


def _vacf_sum(x: jnp.ndarray, n_lags: int) -> jnp.ndarray:
    """Σ over atoms of the velocity autocorrelation; x: (n_t, A, 3)."""
    n_t = x.shape[0]
    corr = _lagged_products(x, n_lags).sum(axis=(-1, -2))     # (n_lags,)
    counts = (n_t - jnp.arange(n_lags)).astype(jnp.float32)
    return (corr / counts).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=('n_lags',))
def msd_block(pos: jnp.ndarray, mask: jnp.ndarray, n_lags: int
              ) -> jnp.ndarray:
    """Σ over an atom chunk of the per-atom MSD, all time origins.

    MSD_a(τ) = (1/(n_t−τ)) Σ_{t} |r_a(t+τ) − r_a(t)|², computed without
    the O(n²) origin loop (see :func:`_msd_sum`).  Positions must be
    UNWRAPPED (as everywhere in the package).

    Args:
        pos:  (n_t, A, 3) f32; mask: (A,) f32 validity.
        n_lags: τ rows returned (τ = 0 … n_lags−1 frames).

    Returns:
        (n_lags,) f32 — Σ_a MSD_a(τ); caller divides by the group size.
    """
    return _msd_sum(pos * mask[None, :, None], n_lags)


@functools.partial(jax.jit, static_argnames=('n_lags',))
def vacf_block(vel: jnp.ndarray, mask: jnp.ndarray, n_lags: int
               ) -> jnp.ndarray:
    """Σ over an atom chunk of the velocity autocorrelation.

    VACF_a(τ) = (1/(n_t−τ)) Σ_t v_a(t)·v_a(t+τ) — linear FFT
    autocorrelation per atom/component, overlap-normalized per lag.

    Args:
        vel:  (n_t, A, 3) f32; mask: (A,) f32 validity.
        n_lags: τ rows returned.

    Returns:
        (n_lags,) f32 — Σ_a VACF_a(τ) in (Å/ps)²; caller divides by the
        group size (VACF(0) is then the mean-square speed ⟨|v|²⟩).
    """
    return _vacf_sum(vel * mask[None, :, None], n_lags)


@functools.partial(jax.jit, static_argnames=('n_lags', 'kind', 'chunk'))
def timecorr_chunks(data: jnp.ndarray, n_lags: int, kind: str,
                    chunk: int) -> jnp.ndarray:
    """All atom chunks of a device-resident group in ONE dispatch.

    ``lax.scan`` over ⌈A/chunk⌉ equal slices of the atom axis (zero-padded
    tail — zero rows are exactly inert in both kernels), each producing the
    chunk's (n_lags,) partial sum.  Replaces the per-chunk host dispatch
    loop (and its per-chunk host→device uploads) that dominated MSD/VACF
    wall time on slow links; the host sums the returned rows in f64, so
    accumulation semantics match the loop it replaces.

    Args:
        data:  (n_t, A, 3) f32 device array (raw positions or velocities).
        n_lags: τ rows; kind: 'msd' | 'vacf'; chunk: atoms per scan step
            (bounds the rfft transient exactly like the old loop).

    Returns:
        (n_chunks, n_lags) f32 — per-chunk Σ_a partial sums.
    """
    n_a = data.shape[1]
    n_chunks = -(-n_a // chunk)
    pad = n_chunks * chunk - n_a
    x = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
    fn = _msd_sum if kind == 'msd' else _vacf_sum

    def body(_, i):
        blk = jax.lax.dynamic_slice_in_dim(x, i * chunk, chunk, axis=1)
        return None, fn(blk, n_lags)

    _, rows = jax.lax.scan(body, None, jnp.arange(n_chunks))
    return rows
