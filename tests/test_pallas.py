"""Pallas fused projection kernel vs the XLA path (interpreter mode on CPU)."""
import jax.numpy as jnp
import numpy as np
import pytest

from psa_tpu.ops import spectral
from psa_tpu.ops.pallas_sed import sed_projection_pallas, sed_spectrum_pallas


@pytest.fixture(scope='module')
def small_problem():
    rng = np.random.default_rng(0)
    n_t, n_a, n_k = 8, 640, 64
    data = rng.normal(size=(n_t, n_a, 3)).astype(np.float32)
    mean64 = rng.uniform(0, 50.0, size=(n_a, 3))
    hi, lo = spectral.split_f64(mean64)
    kv = rng.uniform(-3, 3, size=(n_k, 3)).astype(np.float32)
    return data, hi, lo, kv, mean64


def test_projection_matches_xla(small_problem):
    data, hi, lo, kv, _ = small_problem
    n_t, n_a, _ = data.shape
    data2d = np.transpose(data, (0, 2, 1)).reshape(n_t * 3, n_a)
    re, im = sed_projection_pallas(jnp.asarray(data2d), jnp.asarray(hi),
                                   jnp.asarray(lo), jnp.asarray(kv),
                                   bm=8, bk=64, ba=128, interpret=True)
    # XLA reference: same phase table, same contraction
    cs = spectral._phase_table(jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(kv))
    proj = jnp.dot(jnp.asarray(data2d), cs,
                   precision='highest', preferred_element_type=jnp.float32)
    k = kv.shape[0]
    np.testing.assert_allclose(np.asarray(re), np.asarray(proj[:, :k]),
                               rtol=2e-5, atol=2e-4)
    np.testing.assert_allclose(np.asarray(im), np.asarray(proj[:, k:]),
                               rtol=2e-5, atol=2e-4)


def test_full_spectrum_matches_oracle(small_problem):
    data, hi, lo, kv, mean64 = small_problem
    re, im = sed_spectrum_pallas(jnp.asarray(data), jnp.asarray(hi),
                                 jnp.asarray(lo), jnp.asarray(kv), interpret=True)
    got = np.asarray(re) + 1j * np.asarray(im)
    phase = np.exp(1j * (kv.astype(np.float64) @ mean64.T))
    oracle = np.fft.fft(np.einsum('tac,ka->tkc', data.astype(np.float64), phase),
                        axis=0) / data.shape[0]
    err = np.max(np.abs(got - oracle)) / np.max(np.abs(oracle))
    assert err < 1e-6, err


def test_shape_validation():
    with pytest.raises(ValueError, match="must tile"):
        sed_projection_pallas(jnp.zeros((10, 128)), jnp.zeros((128, 3)),
                              jnp.zeros((128, 3)), jnp.zeros((64, 3)),
                              bm=8, bk=64, ba=128, interpret=True)

