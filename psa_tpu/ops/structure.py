"""Real-space structure: the radial distribution function g(r).

The equal-time pair-correlation companion of the reciprocal-space S(k)
(ops/instantaneous.sk_reduce): coordination shells for crystals and the
short-range order of liquids/glasses.  The reference package computes
nothing in this family (its scope is the harmonic SED, reference
sed_calculator.py:78-83); g(r) is the standard first look at any MD
trajectory, brought on device here.

TPU mapping: the (t_chunk, A, B) distance tensor is built in bounded
blocks (same residency discipline as the angle tensors of the SED/DSF
kernels), minimum-imaged through the FULL cell matrix (triclinic-safe:
round in fractional coordinates), and histogrammed with one
`segment_sum` per block — no host round-trips until the final (n_bins,)
counts.
"""
import functools

import jax
import jax.numpy as jnp

__all__ = ['rdf_block']


@functools.partial(jax.jit, static_argnames=('n_bins',))
def rdf_block(pos_a: jnp.ndarray, pos_b: jnp.ndarray,
              mask_a: jnp.ndarray, mask_b: jnp.ndarray,
              h: jnp.ndarray, h_inv: jnp.ndarray,
              r_max: jnp.ndarray, n_bins: int,
              a_ids: jnp.ndarray, b_ids: jnp.ndarray) -> jnp.ndarray:
    """Pair-distance histogram of one (frames × A-block × B-block) tile.

    Args:
        pos_a: (t, A, 3) f32; pos_b: (t, B, 3) f32 — same frames.
        mask_a: (A,), mask_b: (B,) f32 validity (0 rows contribute nothing).
        h: (3, 3) f32 cell matrix (columns = cell vectors, Cartesian =
            H @ fractional); h_inv: its inverse.  Minimum image rounds the
            FRACTIONAL separation — exact for orthorhombic cells and for
            tilts within the LAMMPS bounds (|tilt| ≤ L/2).
        r_max: scalar f32 — histogram range [0, r_max), bin width r_max/n_bins.
        n_bins: static bin count.
        a_ids, b_ids: (A,) / (B,) int32 GLOBAL atom ids — equal ids are
            dropped (the i == j zero-distance self pairs, excluded by
            identity rather than by r ≈ 0, so genuinely coincident
            distinct atoms still count; shard-safe because ids travel
            with their blocks).  Cross-group tiles with overlapping
            membership are handled for free.

    Returns:
        (n_bins,) f32 pair counts (summed over the tile's frames; both
        (i, j) and (j, i) count when the caller tiles the full A×B square).
    """
    d = pos_a[:, :, None, :] - pos_b[:, None, :, :]       # (t, A, B, 3)
    # HIGHEST: the 3x3 cell transforms must stay true f32 — the TPU MXU
    # default (bf16 passes) moves distances by ~1e-2 of the box and
    # scatters pairs across histogram bins.  Cost is negligible (the
    # kernel is VPU/elementwise-bound).
    hp = jax.lax.Precision.HIGHEST
    frac = jnp.einsum('ij,tabj->tabi', h_inv, d, precision=hp)
    frac = frac - jnp.round(frac)
    d = jnp.einsum('ij,tabj->tabi', h, frac, precision=hp)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))                 # (t, A, B)

    valid = mask_a[None, :, None] * mask_b[None, None, :]
    valid = valid * (a_ids[:, None] != b_ids[None, :])[None, :, :]

    dr = r_max / n_bins
    bins = jnp.floor(r / dr).astype(jnp.int32)
    # out-of-range pairs go to the dropped overflow segment n_bins
    bins = jnp.where((bins >= 0) & (bins < n_bins) & (valid > 0),
                     bins, n_bins)
    # int32 accumulation: an f32 histogram silently stops counting once a
    # bin passes 2^24 within one tile (1.0 + 16777216.0 rounds back down)
    # — reachable at default tile sizes with coarse bins
    counts = jax.ops.segment_sum(
        jnp.broadcast_to((valid > 0).astype(jnp.int32), r.shape).reshape(-1),
        bins.reshape(-1), num_segments=n_bins + 1)
    return counts[:n_bins].astype(jnp.float32)
