"""Factored (anchor ⊕ delta) instantaneous-phase engine — round-5 VERDICT
item 4 (the k-axis analog of the time-incremental engine, generalized).

Commensurate k factor as outer sums of a few lattice base vectors; each
phasor is then (F−1) complex multiplies of exactly-computed base phasors.
Contracts pinned here:

* phasor parity ≤ 1e-6 vs the float64 oracle AT THE EXACT LATTICE k
  (the factored engine's base angles carry the f64 low words of k, so it
  is MORE accurate than the per-element exact path, whose f32 k sits
  ~|k·r|·2⁻²⁴ off the lattice);
* every detector (exact line, gappy line, grid slice, near-line+residual,
  per-axis staircase) reconstructs its k set exactly in Miller space;
* the calculator falls back to the exact engine bit-identically for
  off-lattice, unfactorable, or too-small k sets.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.models import make_random_crystal_trajectory
from psa_tpu.ops import instantaneous as inst
from psa_tpu.ops.instantaneous import commensurate_kpath, factor_k_chunk

L = np.array([17.3, 11.9, 23.4])
BOX = np.diag(L).astype(np.float32)
# the engine derives the lattice from the f32 box: the oracle must too
B = 2 * np.pi * np.linalg.inv(np.diag(L).astype(np.float32)
                              .astype(np.float64)).T


@pytest.fixture(scope='module')
def pos():
    rng = np.random.default_rng(0)
    return rng.uniform(-30, 60, (12, 40, 3)).astype(np.float32)


def oracle_phasors(pos, kv64):
    ang = np.einsum('tac,kc->tak', pos.astype(np.float64), kv64)
    return np.cos(ang), np.sin(ang)


def assert_factored_matches(pos, fk, kv64, n, tol=1e-6):
    c, s = inst._factored_phasors(jnp.asarray(pos), fk)
    c_o, s_o = oracle_phasors(pos, kv64)
    err = max(np.abs(np.asarray(c)[:, :, :n] - c_o).max(),
              np.abs(np.asarray(s)[:, :, :n] - s_o).max())
    assert err < tol, f"phasor error {err:.2e} over {tol}"


def line_k(g, cs):
    m = np.asarray(cs)[:, None] * np.asarray(g)[None, :]
    return m.astype(np.float64) @ B


class TestFactorDetectors:
    def test_exact_line(self, pos):
        kv64 = line_k([1, 2, 1], np.arange(1, 49))
        fk = factor_k_chunk(kv64.astype(np.float32), BOX, pad_to=64)
        assert fk is not None and fk[2].shape == (2, 64)
        assert fk[0].shape[0] < 20           # ~2·√48 base columns
        assert_factored_matches(pos, fk, kv64, 48)

    def test_gappy_unsorted_line(self, pos):
        rng = np.random.default_rng(3)
        sel = rng.permutation(48)[:30]
        kv64 = line_k([1, 2, 1], np.arange(1, 49))[sel]
        fk = factor_k_chunk(kv64.astype(np.float32), BOX, pad_to=32)
        assert fk is not None
        assert_factored_matches(pos, fk, kv64, 30)

    def test_grid_slice(self, pos):
        # contiguous row-major slice of a 2-D miller grid, starting mid-row
        m = np.array([[i, j, 2] for i in range(2, 9) for j in range(-3, 4)],
                     dtype=np.float64)[4:46]
        kv64 = m @ B
        fk = factor_k_chunk(kv64.astype(np.float32), BOX, pad_to=42)
        assert fk is not None and fk[2].shape[0] == 2
        assert_factored_matches(pos, fk, kv64, 42)

    def test_near_line_with_outlier(self, pos):
        kv64 = line_k([1, 2, 1], np.arange(1, 49))
        kv64[5] = np.array([3.0, 1.0, 2.0]) @ B
        fk = factor_k_chunk(kv64.astype(np.float32), BOX, pad_to=48)
        assert fk is not None and fk[2].shape[0] == 3   # + residual factor
        assert_factored_matches(pos, fk, kv64, 48)

    def test_staircase_path(self, pos):
        """An arbitrary continuous direction snapped point-by-point is a
        staircase in Miller space — the per-axis detector must factor it."""
        lbig = np.array([97.3, 81.9, 123.4])
        box_big = np.diag(lbig).astype(np.float32)
        b_big = 2 * np.pi * np.linalg.inv(
            np.diag(lbig).astype(np.float32).astype(np.float64)).T
        t = (np.linspace(0.02, 1.9, 120)[:, None]
             * np.array([1.0, 0.53, 0.21])[None, :])
        kv = inst.nearest_commensurate(t, box_big)
        _, first = np.unique(np.round(kv, 7), axis=0, return_index=True)
        kv = kv[np.sort(first)]
        fk = factor_k_chunk(kv, box_big, pad_to=len(kv))
        assert fk is not None
        frac = (kv.astype(np.float64)
                * np.diag(np.asarray(box_big, dtype=np.float64))
                / (2 * np.pi))
        kv64 = np.round(frac) @ b_big
        assert_factored_matches(pos, fk, kv64, len(kv))

    def test_triclinic_line(self, pos):
        h = np.array([[17.3, 0, 0], [4.1, 11.9, 0], [-2.2, 3.3, 23.4]],
                     dtype=np.float32)
        b_t = 2 * np.pi * np.linalg.inv(h.astype(np.float64)).T
        m = np.arange(1, 49)[:, None] * np.array([1, 2, 1])[None, :]
        kv64 = m.astype(np.float64) @ b_t
        fk = factor_k_chunk(kv64.astype(np.float32), h, pad_to=48)
        assert fk is not None
        assert_factored_matches(pos, fk, kv64, 48)

    def test_rejects(self):
        kv64 = line_k([1, 2, 1], np.arange(1, 49))
        kv = kv64.astype(np.float32)
        # off-lattice
        assert factor_k_chunk(kv * 1.01, BOX, pad_to=64) is None
        # too few points
        assert factor_k_chunk(kv[:8], BOX, pad_to=8) is None
        # random lattice soup: factors would not compress
        rng = np.random.default_rng(1)
        m_rand = rng.integers(-20, 20, (40, 3)).astype(np.float64)
        assert factor_k_chunk((m_rand @ B).astype(np.float32), BOX,
                              pad_to=40) is None
        # sparse line (span ≫ n)
        kv_sparse = line_k([1, 0, 0], np.arange(16) ** 2 + 1)
        assert factor_k_chunk(kv_sparse.astype(np.float32), BOX,
                              pad_to=16) is None

    def test_more_accurate_than_exact_engine(self, pos):
        """The factored base angles carry the f64 low words of k: the
        synthesized phase is the EXACT lattice phase to ~1e-6, while the
        per-element exact path evaluates the f32-rounded k."""
        kv64 = line_k([1, 2, 1], np.arange(1, 49))
        fk = factor_k_chunk(kv64.astype(np.float32), BOX, pad_to=48)
        c_f, s_f = inst._factored_phasors(jnp.asarray(pos), fk)
        c_e, s_e = inst._instant_phasors(jnp.asarray(pos),
                                         jnp.asarray(kv64.astype(np.float32)))
        c_o, s_o = oracle_phasors(pos, kv64)
        err_f = np.abs(np.asarray(c_f) - c_o).max()
        err_e = np.abs(np.asarray(c_e) - c_o).max()
        assert err_f < 1e-6
        assert err_f < err_e            # strictly better vs the lattice truth


class TestCalculatorFactored:
    @pytest.fixture(scope='class')
    def pair(self):
        traj = make_random_crystal_trajectory(n_cells_xyz=(24, 6, 4), basis=2,
                                              n_frames=32, dt_ps=0.01, seed=1)
        ce = SEDCalculator(traj, nx=24, ny=6, nz=4, phase_mode='exact')
        cf = SEDCalculator(traj, nx=24, ny=6, nz=4, phase_mode='factored')
        kv = np.outer(np.linspace(0.02, 2.0, 200), [1, 0, 0]).astype(np.float32)
        kv = commensurate_kpath(kv, traj.box_matrix)
        assert factor_k_chunk(kv, traj.box_matrix, pad_to=64) is not None
        return ce, cf, kv

    def test_sk(self, pair):
        ce, cf, kv = pair
        ske, skf = ce.calculate_sk(kv), cf.calculate_sk(kv)
        np.testing.assert_allclose(skf, ske, rtol=1e-3, atol=1e-8)

    def test_dsf_planes(self, pair):
        ce, cf, kv = pair
        fe, se, cle, cte = ce.calculate_dsf(kv, k_chunk_size=64)
        ff, sf, clf, ctf = cf.calculate_dsf(kv, k_chunk_size=64)
        np.testing.assert_array_equal(fe, ff)
        for a, b in ((se, sf), (cle, clf), (cte, ctf)):
            assert np.abs(a - b).max() <= 1e-5 * np.abs(a).max()

    def test_dsf_self(self, pair):
        ce, cf, kv = pair
        _, sse = ce.calculate_dsf_self(kv, k_chunk_size=64)
        _, ssf = cf.calculate_dsf_self(kv, k_chunk_size=64)
        assert np.abs(sse - ssf).max() <= 1e-5 * np.abs(sse).max()

    def test_isf_both(self, pair):
        ce, cf, kv = pair
        _, ie = ce.calculate_isf(kv, n_lags=8)
        _, iff = cf.calculate_isf(kv, n_lags=8)
        assert np.abs(ie - iff).max() <= 1e-5 * np.abs(ie).max()
        _, ise = ce.calculate_isf_self(kv, n_lags=8)
        _, isf_ = cf.calculate_isf_self(kv, n_lags=8)
        assert np.abs(ise - isf_).max() <= 1e-5 * np.abs(ise).max()

    def test_off_lattice_fallback_bit_identical(self, pair):
        ce, cf, kv = pair
        kv_off = kv * 1.013
        np.testing.assert_array_equal(ce.calculate_sk(kv_off),
                                      cf.calculate_sk(kv_off))

    def test_small_set_fallback_bit_identical(self, pair):
        ce, cf, kv = pair
        np.testing.assert_array_equal(ce.calculate_sk(kv[:5]),
                                      cf.calculate_sk(kv[:5]))

    def test_invalid_mode_rejected(self, pair):
        ce, _, _ = pair
        with pytest.raises(ValueError, match="phase_mode"):
            SEDCalculator(ce.traj, nx=24, ny=6, nz=4, phase_mode='fast')
