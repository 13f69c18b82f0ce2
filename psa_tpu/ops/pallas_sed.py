"""Pallas TPU kernel: fused phase-generation + projection matmul.

Computes the SED projection

    out_re[m, k] = Σ_a data2d[m, a] · cos(A[a, k])
    out_im[m, k] = Σ_a data2d[m, a] · sin(A[a, k])
    A[a, k]      = (mp_hi + mp_lo)_a · kvec_k   (compensated, folded mod 2π)

entirely on-chip: for each (M-block, K-block, A-block) grid step the angle
tile is generated in VMEM (double-single TwoProd + Cody-Waite folding — the
same arithmetic as :mod:`psa_tpu.ops.spectral`), cos/sin run on the VPU, and
the two accumulating matmuls run on the MXU.  The (A, 2K) phase table that the
XLA path materializes in HBM never exists.

Reality check — round-2 shootout on this v5e (M=30720/A=20480/K=512,
f32-exact, value-dependent-readback fence; scripts/tpu_campaign/):

    XLA materialize-table path      17.7 TF/s   (production default)
    this kernel, old 256/256/512     9.6 TF/s
    this kernel, 1024/256/512       15.5 TF/s   (vmem limit raised to 64 MB)
    this kernel, 2048/128/512       15.6 TF/s   (best fused config)

Raising bm divides the per-M-block angle/cos/sin recompute (the kernel's
only overhead vs XLA) and recovers most of the gap, but the XLA path still
wins by ~13% at production shapes because it generates each angle exactly
once.  A "v2" schedule that cached the [cos|sin] tile in VMEM scratch with
the M loop innermost measured FASTER at small M but was numerically WRONG on
hardware: its output blocks are revisited at non-consecutive grid steps,
which Pallas TPU's pipelining does not support for accumulation (rel err ~1
vs XLA; the interpreter hid it).  Keep the reduction dimension innermost.
Decision: the XLA path remains production; this kernel is (a) the fusion
hook for streaming variants where the (N, 2K) table would not fit in HBM,
and (b) a self-contained reference for the kernel-level programming model.
``sed_projection_pallas`` is drop-in interchangeable with the XLA projection
and is cross-checked against it in the test suite.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spectral import _INV_2PI, _PI2_A, _PI2_B, _PI2_C, _SPLITTER

# Block sizes: bm×ba data tile, ba×bk angle/cos/sin tiles, 2×(bm×bk) outputs.
# The shootout's top two configs measured within noise (1024/256/512 at
# 15.5 TF/s vs 2048/128/512 at 15.6 TF/s on a ±30% tunnel; see module
# docstring); this default takes the smaller-bm one for its smaller VMEM
# working set — it needs the raised limit below under double-buffering.
DEFAULT_BM = 1024
DEFAULT_BK = 256
DEFAULT_BA = 512
DEFAULT_VMEM_LIMIT = 64 << 20


def _angles_tile(mp_hi, mp_lo, kv):
    """(ba, 3) × (bk, 3) -> folded angles (ba, bk), double-single accurate.

    Same math as spectral._accurate_angles, written ref-block style.
    """
    s = None
    e = None
    for c in range(3):
        x = mp_hi[:, c:c + 1]                      # (ba, 1)
        y = kv[:, c][None, :]                      # (1, bk)
        # Dekker TwoProd via Veltkamp splitting (exact f32 transforms)
        p = x * y
        cx = x * _SPLITTER
        xhi = cx - (cx - x)
        xlo = x - xhi
        cy = y * _SPLITTER
        yhi = cy - (cy - y)
        ylo = y - yhi
        perr = ((xhi * yhi - p) + xhi * ylo + xlo * yhi) + xlo * ylo
        if s is None:
            s, e = p, perr
        else:
            t = s + p                              # Knuth TwoSum
            bb = t - s
            serr = (s - (t - bb)) + (p - bb)
            s, e = t, e + (perr + serr)
        e = e + mp_lo[:, c:c + 1] * y
    n = jnp.round(s * _INV_2PI)
    return ((s - n * _PI2_A) - n * _PI2_B) - n * _PI2_C + e


def _projection_kernel(data_ref, mp_hi_ref, mp_lo_ref, kv_ref,
                       out_re_ref, out_im_ref):
    """One (m, k, a) grid step: angle tile in VMEM, two MXU accumulations."""
    a_idx = pl.program_id(2)

    angles = _angles_tile(mp_hi_ref[:], mp_lo_ref[:], kv_ref[:])
    cos_t = jnp.cos(angles)
    sin_t = jnp.sin(angles)

    @pl.when(a_idx == 0)
    def _():
        out_re_ref[:] = jnp.zeros_like(out_re_ref)
        out_im_ref[:] = jnp.zeros_like(out_im_ref)

    data = data_ref[:]
    out_re_ref[:] += jnp.dot(data, cos_t, preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)
    out_im_ref[:] += jnp.dot(data, sin_t, preferred_element_type=jnp.float32,
                             precision=lax.Precision.HIGHEST)


@functools.partial(jax.jit, static_argnames=('bm', 'bk', 'ba', 'interpret',
                                             'vmem_limit_bytes'))
def sed_projection_pallas(data2d: jnp.ndarray, mp_hi: jnp.ndarray,
                          mp_lo: jnp.ndarray, k_vectors: jnp.ndarray,
                          bm: int = DEFAULT_BM, bk: int = DEFAULT_BK,
                          ba: int = DEFAULT_BA, interpret: bool = False,
                          vmem_limit_bytes: int = DEFAULT_VMEM_LIMIT
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused projection.

    Args:
        data2d:    (M, A) float32 — time⊗polarization rows over atoms
                   (reshape of the (n_t, A, 3) trajectory to (n_t·3, A)).
        mp_hi/lo:  (A, 3) float32 double-single split mean positions.
        k_vectors: (K, 3) float32.
        bm/bk/ba:  tile sizes; M, K, A must divide evenly (pad at the caller —
                   zero atoms/k rows are harmless).
        interpret: run in the Pallas interpreter (CPU testing).

    Returns:
        (out_re, out_im): (M, K) float32 each.
    """
    m, a = data2d.shape
    k = k_vectors.shape[0]
    if m % bm or k % bk or a % ba:
        raise ValueError(f"shapes (M={m}, K={k}, A={a}) must tile by "
                         f"(bm={bm}, bk={bk}, ba={ba}); pad at the caller")

    grid = (m // bm, k // bk, a // ba)
    return pl.pallas_call(
        _projection_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, ba), lambda i, j, r: (i, r)),
            pl.BlockSpec((ba, 3), lambda i, j, r: (r, 0)),
            pl.BlockSpec((ba, 3), lambda i, j, r: (r, 0)),
            pl.BlockSpec((bk, 3), lambda i, j, r: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, r: (i, j)),
            pl.BlockSpec((bm, bk), lambda i, j, r: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, k), jnp.float32),
            jax.ShapeDtypeStruct((m, k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=vmem_limit_bytes,
        ),
        interpret=interpret,
    )(data2d, mp_hi, mp_lo, k_vectors)


def sed_spectrum_pallas(data: jnp.ndarray, mp_hi: jnp.ndarray, mp_lo: jnp.ndarray,
                        k_vectors: jnp.ndarray, interpret: bool = False
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full SED spectrum through the Pallas projection + XLA batched FFT.

    Pads M/K/A up to tile multiples internally; returns (re, im) of
    Φ(ω, k, pol) shaped (n_t, n_k, 3) like spectral.sed_spectrum.
    """
    n_t, n_atoms, _ = data.shape
    n_k = k_vectors.shape[0]

    def pad_to(x, axis, mult):
        size = x.shape[axis]
        target = -(-size // mult) * mult
        if target == size:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, target - size)
        return jnp.pad(x, widths)

    bm = min(DEFAULT_BM, max(8, -(-n_t * 3 // 8) * 8))
    bk = min(DEFAULT_BK, max(128, 128))
    ba = min(DEFAULT_BA, max(128, 128))

    data2d = jnp.transpose(data, (0, 2, 1)).reshape(n_t * 3, n_atoms)
    data2d = pad_to(pad_to(data2d, 0, bm), 1, ba)
    mp_hi_p = pad_to(mp_hi, 0, ba)
    mp_lo_p = pad_to(mp_lo, 0, ba)
    kv_p = pad_to(k_vectors, 0, bk)

    re, im = sed_projection_pallas(data2d, mp_hi_p, mp_lo_p, kv_p,
                                   bm=bm, bk=bk, ba=ba, interpret=interpret)
    re = re[:n_t * 3, :n_k].reshape(n_t, 3, n_k)
    im = im[:n_t * 3, :n_k].reshape(n_t, 3, n_k)
    spec = jnp.fft.fft(lax.complex(re, im), axis=0) / n_t
    spec = jnp.transpose(spec, (0, 2, 1))
    return (jnp.real(spec).astype(jnp.float32),
            jnp.imag(spec).astype(jnp.float32))
