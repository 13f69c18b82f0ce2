"""Auxiliary subsystems: profiling utilities, sharded SED cache + resume."""
import json
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.io.shard_cache import ShardedSEDCache, trajectory_fingerprint
from psa_tpu.models import make_random_crystal_trajectory
from psa_tpu.utils.profiling import Timer, throughput_report, sync, timed


@pytest.fixture(scope='module')
def traj():
    return make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                          n_frames=16, dt_ps=0.02, seed=5)


class TestShardCache:
    def test_store_load_roundtrip(self, tmp_path):
        cache = ShardedSEDCache(tmp_path, {'a': 1})
        arr = np.arange(12, dtype=np.complex64).reshape(3, 4)
        assert not cache.has(0)
        cache.store(0, arr)
        assert cache.has(0)
        np.testing.assert_array_equal(cache.load(0), arr)
        assert cache.completed_chunks() == 1
        assert (cache.dir / "manifest.json").exists()
        meta = json.loads((cache.dir / "manifest.json").read_text())
        assert meta['a'] == 1

    def test_key_depends_on_workload(self, tmp_path):
        c1 = ShardedSEDCache(tmp_path, {'mode': 'coherent'})
        c2 = ShardedSEDCache(tmp_path, {'mode': 'incoherent'})
        assert c1.key != c2.key

    def test_corrupt_chunk_recovers(self, tmp_path):
        cache = ShardedSEDCache(tmp_path, {'x': 1})
        cache.store(3, np.ones(4))
        (cache.dir / "chunk_00003.npy").write_bytes(b"garbage")
        assert cache.load(3) is None          # purged, will recompute
        assert not cache.has(3)

    def test_file_fingerprint_sees_same_size_overwrites(self, tmp_path):
        """An in-place rewrite with identical size/frame-count must change
        the key (pod_sweep --from-dump resume safety)."""
        from psa_tpu.io.shard_cache import file_fingerprint
        p = tmp_path / "t.dump"
        p.write_bytes(b"A" * 4096)
        f1 = file_fingerprint(p)
        assert f1 == file_fingerprint(p)              # deterministic
        p.write_bytes(b"A" * 2048 + b"B" + b"A" * 2047)   # same size
        assert file_fingerprint(p) != f1

    def test_fingerprint_changes_with_data(self, traj):
        f1 = trajectory_fingerprint(traj)
        other = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                               n_frames=16, dt_ps=0.02, seed=6)
        assert f1 != trajectory_fingerprint(other)
        assert f1 == trajectory_fingerprint(traj)  # deterministic


class TestCalculateWithCache:
    def test_resume_uses_cached_chunks(self, traj, tmp_path):
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=20)
        a = calc.calculate(k_mags, k_vecs, k_chunk_size=8, cache_dir=tmp_path)
        # second run must load every chunk (poison the compute path)
        calc2 = SEDCalculator(traj, nx=3, ny=2, nz=2)
        calc2._group_spectrum_np = None  # would raise if any chunk recomputed
        b = calc2.calculate(k_mags, k_vecs, k_chunk_size=8, cache_dir=tmp_path)
        np.testing.assert_allclose(a.sed, b.sed, atol=0)

    def test_partial_resume(self, traj, tmp_path):
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        k_mags, k_vecs = calc.get_k_path('y', bz_coverage=1.0, n_k=20)
        full = calc.calculate(k_mags, k_vecs, k_chunk_size=8, cache_dir=tmp_path)
        # delete one chunk -> only that chunk recomputes
        from psa_tpu.io.shard_cache import ShardedSEDCache
        dirs = list(tmp_path.glob('*/chunk_00001.npy'))
        assert dirs
        dirs[0].unlink()
        again = calc.calculate(k_mags, k_vecs, k_chunk_size=8, cache_dir=tmp_path)
        np.testing.assert_allclose(full.sed, again.sed, atol=1e-7)

    def test_mass_weighted_not_served_from_unweighted_cache(self, traj, tmp_path):
        """Regression: mass_weighted must be part of the cache key, and masses
        part of the trajectory fingerprint — a weighted run sharing a
        cache_dir with an unweighted run must NOT reuse its chunks."""
        from dataclasses import replace
        masses = np.where(traj.types == 1, 1.0, 4.0).astype(np.float32)
        wtraj = replace(traj, masses=masses)
        calc_u = SEDCalculator(wtraj, nx=3, ny=2, nz=2)
        k_mags, k_vecs = calc_u.get_k_path('x', bz_coverage=1.0, n_k=16)
        unweighted = calc_u.calculate(k_mags, k_vecs, k_chunk_size=8,
                                      cache_dir=tmp_path)
        calc_w = SEDCalculator(wtraj, nx=3, ny=2, nz=2, mass_weighted=True)
        weighted = calc_w.calculate(k_mags, k_vecs, k_chunk_size=8,
                                    cache_dir=tmp_path)
        truth = SEDCalculator(wtraj, nx=3, ny=2, nz=2,
                              mass_weighted=True).calculate(k_mags, k_vecs)
        assert not np.allclose(weighted.sed, unweighted.sed)
        np.testing.assert_allclose(weighted.sed, truth.sed, atol=0)
        # masses feed the fingerprint
        heavier = replace(traj, masses=masses * 2)
        assert trajectory_fingerprint(wtraj) != trajectory_fingerprint(heavier)
        assert trajectory_fingerprint(wtraj) != trajectory_fingerprint(traj)

    def test_incoherent_cache(self, traj, tmp_path):
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=12)
        a = calc.calculate(k_mags, k_vecs, basis_atom_types=[1, 2],
                           summation_mode='incoherent', k_chunk_size=8,
                           cache_dir=tmp_path)
        b = calc.calculate(k_mags, k_vecs, basis_atom_types=[1, 2],
                           summation_mode='incoherent', k_chunk_size=8,
                           cache_dir=tmp_path)
        np.testing.assert_allclose(a.sed, b.sed, atol=0)


class TestProfiling:
    def test_timer_sections(self):
        t = Timer()
        with t.section('a'):
            pass
        with t.section('a'):
            pass
        with t.section('b'):
            pass
        assert t.counts == {'a': 2, 'b': 1}
        rep = t.report()
        assert 'TOTAL' in rep and 'a' in rep

    def test_throughput_report(self):
        r = throughput_report(n_k=100, seconds=2.0, n_atoms=1000, n_t=512)
        assert r['k_points_per_sec'] == 50.0
        assert r['effective_tflops'] > 0

    def test_sync_and_timed(self):
        import jax.numpy as jnp
        x = jnp.ones((4, 4))
        sync(x)
        sync({'a': x, 'b': (x, x)})
        with timed("block", sync_tree=x):
            pass
