"""Library-level kill-and-resume for the long sweep families (round-4
VERDICT item 5): browse, peaks, DSF, S(k), ISF, and the self parts each
accept ``cache_dir`` and checkpoint per k-chunk under a content-derived key
(io/shard_cache.py).  The SED `calculate`/`calculate_gridded` resume is
covered in test_aux.py / test_gridded.py.

Each family gets: (a) full-cache replay equals the fresh result exactly,
(b) a deleted chunk ("kill mid-run") recomputes only that chunk, and the
replay is poisoned so a cache miss would crash loudly.
"""
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.models import (make_chain_trajectory,
                            make_random_crystal_trajectory)
from psa_tpu.ops import instantaneous


@pytest.fixture(scope='module')
def crystal():
    return make_random_crystal_trajectory(n_cells_xyz=(3, 3, 2), basis=2,
                                          n_frames=20, dt_ps=0.02, seed=3)


@pytest.fixture(scope='module')
def calc(crystal):
    return SEDCalculator(crystal, nx=3, ny=3, nz=2)


@pytest.fixture(scope='module')
def kv():
    return np.outer(np.linspace(0.1, 1.4, 12), [1, 0.3, 0]).astype(np.float32)


def _chain_calc():
    traj = make_chain_trajectory(n_cells=12, n_frames=64, dt_ps=0.02,
                                 a=2.5, omega_max_thz=7.0, seed=4)
    calc = SEDCalculator(traj, nx=12, ny=1, nz=1)
    m = np.arange(1, 9)
    kvec = np.zeros((len(m), 3), dtype=np.float32)
    kvec[:, 0] = 2 * np.pi * m / (12 * 2.5)
    return calc, instantaneous.nearest_commensurate(kvec, traj.box_lengths)


def _delete_one_chunk(tmp_path, idx=1):
    chunks = sorted(tmp_path.glob(f'*/chunk_{idx:05d}.npy'))
    assert chunks, "expected a written chunk to delete"
    chunks[0].unlink()


def _poison(calc):
    """Any recompute after this raises — proves replay is cache-only."""
    calc._dsf_blocks = None
    calc._group_device_arrays = None
    return calc


class TestBrowseResume:
    def test_replay_and_partial(self, crystal, calc, kv, tmp_path):
        f, i0, _ = calc.calculate_kgrid_browse(kv, k_chunk_size=4,
                                               cache_dir=tmp_path)
        assert list(tmp_path.glob('*/chunk_*.npy'))
        # full replay from cache only
        calc2 = _poison(SEDCalculator(crystal, nx=3, ny=3, nz=2))
        _, i1, _ = calc2.calculate_kgrid_browse(kv, k_chunk_size=4,
                                                cache_dir=tmp_path)
        np.testing.assert_allclose(i1, i0, atol=0)
        # killed mid-run: one missing chunk recomputes, rest replay
        _delete_one_chunk(tmp_path)
        _, i2, _ = calc.calculate_kgrid_browse(kv, k_chunk_size=4,
                                               cache_dir=tmp_path)
        np.testing.assert_allclose(i2, i0, rtol=1e-6, atol=1e-8)

    def test_chiral_planes_cached_with_phase(self, calc, kv, tmp_path):
        _, i0, p0 = calc.calculate_kgrid_browse(kv, k_chunk_size=4,
                                                chiral=True,
                                                cache_dir=tmp_path)
        _, i1, p1 = calc.calculate_kgrid_browse(kv, k_chunk_size=4,
                                                chiral=True,
                                                cache_dir=tmp_path)
        np.testing.assert_allclose(i1, i0, atol=0)
        np.testing.assert_allclose(p1, p0, atol=0)
        # the chiral cache must not serve the non-chiral call (key differs)
        _, i2, p2 = calc.calculate_kgrid_browse(kv, k_chunk_size=4,
                                                cache_dir=tmp_path)
        assert p2 is None
        np.testing.assert_allclose(i2, i0, rtol=1e-6, atol=1e-8)


class TestPeaksResume:
    def test_replay_and_partial(self, crystal, calc, kv, tmp_path):
        p0 = calc.calculate_kgrid_peaks(kv, n_peaks=2, k_chunk_size=4,
                                        engine='direct', cache_dir=tmp_path)
        calc2 = _poison(SEDCalculator(crystal, nx=3, ny=3, nz=2))
        p1 = calc2.calculate_kgrid_peaks(kv, n_peaks=2, k_chunk_size=4,
                                         engine='direct',
                                         cache_dir=tmp_path)
        for a, b in zip(p1, p0):
            np.testing.assert_allclose(a, b, atol=0)
        _delete_one_chunk(tmp_path)
        p2 = calc.calculate_kgrid_peaks(kv, n_peaks=2, k_chunk_size=4,
                                        engine='direct', cache_dir=tmp_path)
        for a, b in zip(p2, p0):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_matches_uncached_scan_path(self, calc, kv, tmp_path):
        """The resumable per-chunk form must equal the single-dispatch
        lax.map sweep bin for bin."""
        p0 = calc.calculate_kgrid_peaks(kv, n_peaks=2, k_chunk_size=4,
                                        engine='direct')
        p1 = calc.calculate_kgrid_peaks(kv, n_peaks=2, k_chunk_size=4,
                                        engine='direct', cache_dir=tmp_path)
        for a, b in zip(p1, p0):
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)

    def test_gridded_engine_rejected(self, calc, kv, tmp_path):
        with pytest.raises(ValueError, match="direct"):
            calc.calculate_kgrid_peaks(kv, engine='gridded',
                                       k_grid_shape=(4, 3),
                                       cache_dir=tmp_path)


class TestDSFFamilyResume:
    def test_dsf_replay_and_partial(self, tmp_path):
        calc, kvec = _chain_calc()
        f, s0, cl0, ct0 = calc.calculate_dsf(kvec, k_chunk_size=3,
                                             cache_dir=tmp_path)
        _poison(calc)
        _, s1, cl1, ct1 = calc.calculate_dsf(kvec, k_chunk_size=3,
                                             cache_dir=tmp_path)
        np.testing.assert_allclose(s1, s0, atol=0)
        np.testing.assert_allclose(cl1, cl0, atol=0)
        np.testing.assert_allclose(ct1, ct0, atol=0)
        calc2, _ = _chain_calc()
        _delete_one_chunk(tmp_path)
        _, s2, _, _ = calc2.calculate_dsf(kvec, k_chunk_size=3,
                                          cache_dir=tmp_path)
        np.testing.assert_allclose(s2, s0, rtol=1e-6, atol=1e-9)

    def test_sk_and_isf_resume(self, tmp_path):
        calc, kvec = _chain_calc()
        sk0 = calc.calculate_sk(kvec, k_chunk_size=3,
                                cache_dir=tmp_path / 'sk')
        lags, f0 = calc.calculate_isf(kvec, n_lags=8, k_chunk_size=3,
                                      cache_dir=tmp_path / 'isf')
        _poison(calc)
        sk1 = calc.calculate_sk(kvec, k_chunk_size=3,
                                cache_dir=tmp_path / 'sk')
        _, f1 = calc.calculate_isf(kvec, n_lags=8, k_chunk_size=3,
                                   cache_dir=tmp_path / 'isf')
        np.testing.assert_allclose(sk1, sk0, atol=0)
        np.testing.assert_allclose(f1, f0, atol=0)

    def test_self_parts_resume(self, tmp_path):
        calc, kvec = _chain_calc()
        _, ss0 = calc.calculate_dsf_self(kvec[:4], k_chunk_size=2,
                                         cache_dir=tmp_path / 'ds')
        _, fs0 = calc.calculate_isf_self(kvec[:4], n_lags=8, k_chunk_size=2,
                                         cache_dir=tmp_path / 'is')
        _poison(calc)
        _, ss1 = calc.calculate_dsf_self(kvec[:4], k_chunk_size=2,
                                         cache_dir=tmp_path / 'ds')
        _, fs1 = calc.calculate_isf_self(kvec[:4], n_lags=8, k_chunk_size=2,
                                         cache_dir=tmp_path / 'is')
        np.testing.assert_allclose(ss1, ss0, atol=0)
        np.testing.assert_allclose(fs1, fs0, atol=0)

    def test_welch_key_separates(self, tmp_path):
        """Welch planes must not be served from the single-window cache."""
        calc, kvec = _chain_calc()
        _, s0, _, _ = calc.calculate_dsf(kvec, k_chunk_size=3,
                                         cache_dir=tmp_path)
        _, sw, _, _ = calc.calculate_dsf(kvec, k_chunk_size=3,
                                         welch_segments=4,
                                         cache_dir=tmp_path)
        assert sw.shape[0] != s0.shape[0]       # coarser frequency grid
        _, s1, _, _ = calc.calculate_dsf(kvec, k_chunk_size=3,
                                         cache_dir=tmp_path)
        np.testing.assert_allclose(s1, s0, atol=0)

    def test_phase_mode_in_key(self, tmp_path):
        """The incremental/exact engines differ at ~1e-7 — their chunks
        must not cross-contaminate through a shared cache_dir."""
        calc_i, kvec = _chain_calc()
        calc_i = SEDCalculator(calc_i.traj, nx=12, ny=1, nz=1,
                               phase_mode='incremental')
        _, si, _, _ = calc_i.calculate_dsf(kvec, k_chunk_size=3,
                                           cache_dir=tmp_path)
        calc_e = SEDCalculator(calc_i.traj, nx=12, ny=1, nz=1,
                               phase_mode='exact')
        _, se, _, _ = calc_e.calculate_dsf(kvec, k_chunk_size=3,
                                           cache_dir=tmp_path)
        truth_e = SEDCalculator(calc_i.traj, nx=12, ny=1, nz=1,
                                phase_mode='exact')
        _, st, _, _ = truth_e.calculate_dsf(kvec, k_chunk_size=3)
        np.testing.assert_allclose(se, st, atol=0)
