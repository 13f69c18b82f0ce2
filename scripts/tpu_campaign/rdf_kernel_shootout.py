"""g(r) binning-kernel shootout on the real chip.

The production rdf_block bins with a sort-based `segment_sum` (measured
0.08 G pairs/s at N=1e4).  Candidate: cumulative edge comparison —
count[b] = Σ (r < edge_b) reduces over the pair axes with no sort and no
materialized one-hot (XLA fuses the broadcast into the reduction), then
counts = diff(cum).  Both accumulate in int32.  Writes
rdf_kernel_shootout.json with warm timings + bit-equality.
"""
import json
import time
from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import functools

from psa_tpu.ops import structure

OUT = Path(__file__).parent / "rdf_kernel_shootout.json"


@functools.partial(jax.jit, static_argnames=('n_bins',))
def rdf_block_segsum(pos_a, pos_b, mask_a, mask_b, h, h_inv, r_max, n_bins,
                     a_ids, b_ids):
    """The original sort/scatter binning (replaced in production by the
    cumulative comparison after this shootout)."""
    d = pos_a[:, :, None, :] - pos_b[:, None, :, :]
    hp = jax.lax.Precision.HIGHEST
    frac = jnp.einsum('ij,tabj->tabi', h_inv, d, precision=hp)
    frac = frac - jnp.round(frac)
    d = jnp.einsum('ij,tabj->tabi', h, frac, precision=hp)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    valid = (mask_a[None, :, None] * mask_b[None, None, :]) > 0
    valid = valid & (a_ids[:, None] != b_ids[None, :])[None, :, :]
    dr = r_max / n_bins
    bins = jnp.floor(r / dr).astype(jnp.int32)
    bins = jnp.where((bins >= 0) & (bins < n_bins) & valid, bins, n_bins)
    counts = jax.ops.segment_sum(
        jnp.broadcast_to(valid.astype(jnp.int32), r.shape).reshape(-1),
        bins.reshape(-1), num_segments=n_bins + 1)
    return counts[:n_bins]


@functools.partial(jax.jit, static_argnames=('n_bins',))
def rdf_block_cum(pos_a, pos_b, mask_a, mask_b, h, h_inv, r_max, n_bins,
                  a_ids, b_ids):
    d = pos_a[:, :, None, :] - pos_b[:, None, :, :]
    hp = jax.lax.Precision.HIGHEST
    frac = jnp.einsum('ij,tabj->tabi', h_inv, d, precision=hp)
    frac = frac - jnp.round(frac)
    d = jnp.einsum('ij,tabj->tabi', h, frac, precision=hp)
    r = jnp.sqrt(jnp.sum(d * d, axis=-1))
    valid = (mask_a[None, :, None] * mask_b[None, None, :]) > 0
    valid = valid & (a_ids[:, None] != b_ids[None, :])[None, :, :]
    edges = (jnp.arange(1, n_bins + 1, dtype=jnp.float32)
             * (r_max / n_bins))
    # cumulative: (t, A, B, n_bins) bool, fused into the reduction
    below = (r[..., None] < edges) & valid[..., None]
    cum = jnp.sum(below.astype(jnp.int32), axis=(0, 1, 2))
    return jnp.diff(cum, prepend=0).astype(jnp.float32)


def main():
    rng = np.random.default_rng(0)
    t_c, blk, n_bins = 16, 1024, 200
    pa = rng.uniform(0, 40, (t_c, blk, 3)).astype(np.float32)
    pb = rng.uniform(0, 40, (t_c, blk, 3)).astype(np.float32)
    h = np.diag([40.0] * 3).astype(np.float32)
    ones = np.ones(blk, np.float32)
    ida = np.arange(blk, dtype=np.int32)
    idb = np.arange(blk, 2 * blk, dtype=np.int32)
    args = (jnp.asarray(pa), jnp.asarray(pb), jnp.asarray(ones),
            jnp.asarray(ones), jnp.asarray(h),
            jnp.asarray(np.linalg.inv(h)), jnp.float32(12.0))

    res = {"t_chunk": t_c, "block": blk, "n_bins": n_bins,
           "pairs_per_call": t_c * blk * blk}
    # NOTE (measured trap): timing REPEATED IDENTICAL calls reported
    # 65 G pairs/s for segment_sum while production ran 0.08 — the repeats
    # did not re-execute.  Vary an input every rep.
    pa_reps = [jnp.asarray(pa + np.float32(0.001 * i)) for i in range(10)]
    for name, fn in (("segment_sum", rdf_block_segsum),
                     ("cum_compare", structure.rdf_block)):
        out = fn(*args, n_bins, jnp.asarray(ida), jnp.asarray(idb))
        out.block_until_ready()
        t0 = time.time()
        reps = 10
        for i in range(reps):
            out = fn(pa_reps[i], *args[1:], n_bins, jnp.asarray(ida),
                     jnp.asarray(idb))
        out.block_until_ready()
        dt = (time.time() - t0) / reps
        res[f"{name}_s_per_call"] = round(dt, 4)
        res[f"{name}_gpairs_per_s"] = round(t_c * blk * blk / dt / 1e9, 3)
        res[f"{name}_counts"] = np.asarray(out)[:5].tolist()
    a = rdf_block_segsum(*args, n_bins, jnp.asarray(ida),
                         jnp.asarray(idb))
    b = structure.rdf_block(*args, n_bins, jnp.asarray(ida),
                            jnp.asarray(idb))
    res["bit_equal"] = bool(np.array_equal(np.asarray(a), np.asarray(b)))
    OUT.write_text(json.dumps(res, indent=1))
    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
