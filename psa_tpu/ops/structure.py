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
from jax import lax

__all__ = ['rdf_block', 'rdf_sweep']


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
    return _tile_hist(pos_a, pos_b, mask_a, mask_b, h, h_inv, r_max,
                      n_bins, a_ids, b_ids)


def _tile_hist(pos_a, pos_b, mask_a, mask_b, h, h_inv, r_max, n_bins,
               a_ids, b_ids):
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

    valid = (mask_a[None, :, None] * mask_b[None, None, :]) > 0
    valid = valid & (a_ids[:, None] != b_ids[None, :])[None, :, :]

    # Cumulative edge-comparison binning: count[b] = Σ (r < edge_b), then
    # diff.  No sort, no scatter — XLA fuses the (pairs × n_bins) bool
    # broadcast into the reduction.  Measured ~14× the sort-based
    # segment_sum on the chip (10.7 vs ~150 ms per 1.7e7-pair tile).
    # int32 accumulation: an f32 histogram silently stops counting once a
    # bin passes 2^24 within one tile (1.0 + 16777216.0 rounds back down)
    # — reachable at default tile sizes with coarse bins.
    edges = (jnp.arange(1, n_bins + 1, dtype=jnp.float32)
             * (r_max / n_bins))
    below = (r[..., None] < edges) & valid[..., None]
    cum = jnp.sum(below.astype(jnp.int32), axis=(0, 1, 2))
    return jnp.diff(cum, prepend=0)


@functools.partial(jax.jit, static_argnames=('n_bins', 'block'))
def rdf_sweep(pos_a: jnp.ndarray, mask_a: jnp.ndarray, a_ids: jnp.ndarray,
              pos_b: jnp.ndarray, mask_b: jnp.ndarray, b_ids: jnp.ndarray,
              h: jnp.ndarray, h_inv: jnp.ndarray, r_max: jnp.ndarray,
              n_bins: int, block: int) -> jnp.ndarray:
    """Full A×B pair histogram of one frame chunk in ONE dispatch.

    The per-tile launch loop paid ~100–150 ms of remote-dispatch latency
    PER TILE on the tunneled chip (measured: 0.08–0.11 G pairs/s end to
    end against the tile kernel's own 65 G pairs/s) — so the whole
    (A-blocks × B-blocks) sweep runs inside one program: `lax.scan` over
    A rows, inner scan over B tiles, one (block, block) distance tile
    resident per step.

    Args:
        pos_a: (t, A_pad, 3) f32, A_pad % block == 0; mask_a/a_ids as in
            :func:`rdf_block` but full-length.  Same for the B side.
        n_bins, block: static.

    Returns:
        (A_pad // block, n_bins) int32 — one histogram PER A ROW, summed
        on the host: the inner accumulation is bounded by one row's pairs
        (t · block · B_pad — the caller caps the frame chunk so this
        stays below 2³¹), and emitting rows instead of a grand total
        keeps int32 exact at any trajectory size.
    """
    n_a_rows = pos_a.shape[1] // block
    n_b_rows = pos_b.shape[1] // block

    def a_row(_, i):
        pa = lax.dynamic_slice_in_dim(pos_a, i * block, block, axis=1)
        ma = lax.dynamic_slice_in_dim(mask_a, i * block, block, axis=0)
        ida = lax.dynamic_slice_in_dim(a_ids, i * block, block, axis=0)

        def b_tile(acc, j):
            pb = lax.dynamic_slice_in_dim(pos_b, j * block, block, axis=1)
            mb = lax.dynamic_slice_in_dim(mask_b, j * block, block, axis=0)
            idb = lax.dynamic_slice_in_dim(b_ids, j * block, block, axis=0)
            return acc + _tile_hist(pa, pb, ma, mb, h, h_inv, r_max,
                                    n_bins, ida, idb), None

        row, _ = lax.scan(b_tile, jnp.zeros(n_bins, jnp.int32),
                          jnp.arange(n_b_rows))
        return None, row

    _, rows = lax.scan(a_row, None, jnp.arange(n_a_rows))
    return rows
