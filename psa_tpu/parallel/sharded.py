"""Multi-device SED: shard_map over a (t, a, k) device mesh.

The reference's only scale mechanism is a serial k-chunk loop
(reference sed_calculator.py:268-294).  On a TPU pod the same workload maps to
a 3-axis mesh:

  * ``k``  — k-points: embarrassingly parallel (the SED of one k never touches
             another); pure data parallelism, zero collectives.
  * ``a``  — atoms: the contraction dimension of the projection matmul; each
             device holds an atom shard of the trajectory (this is what makes
             1.2 TB pod trajectories fit), computes a partial projection, and
             one ``psum`` over ICI reduces the partials.
  * ``t``  — time: frames sharded across devices for HBM capacity; the
             projected signal (tiny compared to the trajectory) is
             ``all_gather``-ed over ICI so each device FFTs full-length time
             series for its k shard.

Communication cost: the psum/all_gather move only the projected
(n_t, 3, 2·K_local) tensor — tens of MB — never the trajectory itself.
"""
from __future__ import annotations

import logging
import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..ops import spectral

logger = logging.getLogger(__name__)

AXIS_T, AXIS_A, AXIS_K = 't', 'a', 'k'


def mesh_shape_for(n_devices: int, n_t: Optional[int] = None) -> Tuple[int, int, int]:
    """Factor ``n_devices`` into a (t, a, k) mesh shape.

    Heuristic: favor the k axis (communication-free), then atoms, then time.
    The t factor must divide n_t (FFT length cannot be padded); pass n_t to
    enforce that, or leave None to allow any t factor.
    """
    best = (1, 1, n_devices)
    # enumerate all factorizations t*a*k = n
    for t in range(1, n_devices + 1):
        if n_devices % t:
            continue
        if n_t is not None and t > 1 and (n_t % t):
            continue
        rest = n_devices // t
        for a in range(1, rest + 1):
            if rest % a:
                continue
            k = rest // a
            # score: prefer large k, then large a, then small t
            if (k, a, -t) > (best[2], best[1], -best[0]):
                best = (t, a, k)
    return best


def make_mesh(n_devices: Optional[int] = None,
              shape: Optional[Tuple[int, int, int]] = None,
              devices: Optional[Sequence] = None,
              n_t: Optional[int] = None) -> Mesh:
    """Build a (t, a, k) mesh over the first ``n_devices`` JAX devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = mesh_shape_for(len(devs), n_t=n_t)
    if math.prod(shape) != len(devs):
        raise ValueError(f"mesh shape {shape} does not cover {len(devs)} devices")
    dev_array = np.array(devs).reshape(shape)
    return Mesh(dev_array, axis_names=(AXIS_T, AXIS_A, AXIS_K))


def _pad_to(arr: np.ndarray, axis: int, multiple: int) -> np.ndarray:
    size = arr.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return arr
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, target - size)
    return np.pad(arr, pad_width)


def sharded_sed_spectrum(mesh: Mesh, data: np.ndarray, mean_pos64: np.ndarray,
                         k_vectors: np.ndarray, precision: str = 'parity',
                         want_intensity: bool = False):
    """SED spectrum over a device mesh.

    Args:
        mesh: (t, a, k) mesh from :func:`make_mesh`.  The t extent must divide
            n_frames exactly.
        data: (n_t, n_atoms, 3) float32 host array (velocities/displacements).
        mean_pos64: (n_atoms, 3) float64 mean positions.
        k_vectors: (n_k, 3) float32.
        want_intensity: return Σ_α|Φ|² (n_t, n_k) instead of the (re, im) pair.

    Returns:
        Host NumPy: intensity (n_t, n_k) f32, or (re, im) pair of (n_t, n_k, 3).
        Padding added for divisibility is stripped before returning.
    """
    n_t, n_atoms, _ = data.shape
    n_k = k_vectors.shape[0]
    t_sh, a_sh, k_sh = (mesh.shape[AXIS_T], mesh.shape[AXIS_A], mesh.shape[AXIS_K])
    if n_t % t_sh:
        raise ValueError(f"time axis ({n_t}) must divide evenly over the t mesh axis ({t_sh}); "
                         "the FFT length cannot be padded")

    # Zero-pad atoms (zero data contributes nothing) and k (rows discarded).
    data_p = _pad_to(np.asarray(data, dtype=np.float32), 1, a_sh)
    mp_hi, mp_lo = spectral.split_f64(np.asarray(mean_pos64, dtype=np.float64))
    mp_hi = _pad_to(mp_hi, 0, a_sh)
    mp_lo = _pad_to(mp_lo, 0, a_sh)
    k_p = _pad_to(np.asarray(k_vectors, dtype=np.float32), 0, k_sh)

    prec = spectral.resolve_precision(precision)

    def local_fn(data_l, hi_l, lo_l, k_l):
        # data_l: (n_t/t, N/a, 3); k_l: (K/k, 3)
        cs = spectral._phase_table(hi_l, lo_l, k_l)                 # (N/a, 2K/k)
        proj = spectral._project(data_l, cs, prec)                  # (n_t/t, 3, 2K/k)
        proj = jax.lax.psum(proj, AXIS_A)                           # reduce atom shards
        proj = jax.lax.all_gather(proj, AXIS_T, axis=0, tiled=True)  # full time axis
        re, im = spectral._fft_spectrum(proj, proj.shape[0])        # (n_t, K/k, 3)
        if want_intensity:
            return jnp.sum(re * re + im * im, axis=-1).astype(jnp.float32)
        return re, im

    in_specs = (P(AXIS_T, AXIS_A, None), P(AXIS_A, None), P(AXIS_A, None),
                P(AXIS_K, None))
    if want_intensity:
        out_specs = P(None, AXIS_K)
    else:
        out_specs = (P(None, AXIS_K, None), P(None, AXIS_K, None))

    # check_vma=False: outputs ARE replicated over 't' and 'a' (psum over the
    # atom axis, tiled all_gather over time), but the static replication
    # checker cannot infer that through lax.all_gather(tiled=True).
    fn = jax.jit(jax.shard_map(local_fn, mesh=mesh, in_specs=in_specs,
                               out_specs=out_specs, check_vma=False))
    out = fn(data_p, mp_hi, mp_lo, k_p)

    if want_intensity:
        return np.asarray(out)[:, :n_k]
    re, im = out
    return np.asarray(re)[:, :n_k, :], np.asarray(im)[:, :n_k, :]
