"""Welch segment averaging on the pod-scale sweep paths (round-4 item 4).

The single-chip ``calculate_welch`` (full-complex k-path) is oracle-tested
in test_calculator.py::TestWelch.  These tests cover the segment-averaged
estimator where it matters for long runs: the browse/peaks sweeps, their
mesh-sharded forms, and the DSF family — each against a float64 NumPy
segment oracle, plus the segments=1+'rect' degeneracy to the classic
single-window estimator.
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
                                          n_frames=24, dt_ps=0.02, seed=3)


@pytest.fixture(scope='module')
def calc(crystal):
    return SEDCalculator(crystal, nx=3, ny=3, nz=2)


@pytest.fixture(scope='module')
def kv():
    return np.outer(np.linspace(0.1, 1.2, 9), [1, 0.5, 0]).astype(np.float32)


def welch_spectra_oracle(traj, k_vectors, segments, window, group_idx=None):
    """(S, seg, K, 3) complex f64 per-segment spectra of the SED formula."""
    if group_idx is None:
        group_idx = np.arange(traj.n_atoms)
    mean_pos = traj.positions.astype(np.float64).mean(axis=0)
    data = traj.velocities[:, group_idx, :].astype(np.float64)
    phase = np.exp(1j * (k_vectors.astype(np.float64)
                         @ mean_pos[group_idx].T))
    s = np.einsum('tac,ka->tkc', data, phase)
    seg = traj.n_frames // segments
    s = s[:seg * segments].reshape(segments, seg, *s.shape[1:])
    if window == 'hann':
        w = 1.0 - np.cos(2 * np.pi * np.arange(seg) / seg)
        s = s * w[None, :, None, None]
    return np.fft.fft(s, axis=1) / seg


def browse_oracle(traj, k_vectors, segments, window, group_idx=None,
                  comp_pair=None):
    """(freqs_kept_mask, intensity[, phase]) Welch browse oracle (ω ≥ 0)."""
    spec = welch_spectra_oracle(traj, k_vectors, segments, window, group_idx)
    seg = traj.n_frames // segments
    mask = np.fft.fftfreq(seg, d=traj.dt_ps) >= 0
    spec = spec[:, mask]
    inten = np.mean(np.sum(np.abs(spec) ** 2, axis=-1), axis=0)
    if comp_pair is None:
        return mask, inten, None
    c1, c2 = comp_pair
    c12 = np.mean(spec[..., c1] * np.conj(spec[..., c2]), axis=0)
    delta = np.angle(c12)
    delta = np.where(delta > np.pi / 2, np.pi - delta, delta)
    delta = np.where(delta < -np.pi / 2, -np.pi - delta, delta)
    return mask, inten, delta


class TestBrowseWelch:
    @pytest.mark.parametrize("window", ["rect", "hann"])
    def test_matches_segment_oracle(self, crystal, calc, kv, window):
        freqs, inten, _ = calc.calculate_kgrid_browse(
            kv, welch_segments=3, welch_window=window, k_chunk_size=4)
        _, want, _ = browse_oracle(crystal, kv, 3, window)
        assert inten.shape == want.shape
        assert np.abs(inten - want).max() <= 1e-5 * want.max()
        np.testing.assert_allclose(
            freqs, np.fft.fftfreq(crystal.n_frames // 3, d=0.02)[
                np.fft.fftfreq(crystal.n_frames // 3, d=0.02) >= 0],
            rtol=1e-6)

    def test_single_segment_rect_matches_default(self, calc, kv):
        f0, i0, _ = calc.calculate_kgrid_browse(kv)
        f1, i1, _ = calc.calculate_kgrid_browse(kv, welch_segments=1,
                                                welch_window='rect')
        np.testing.assert_allclose(f1, f0, atol=0)
        np.testing.assert_allclose(i1, i0, rtol=1e-6, atol=1e-10)

    def test_chiral_phase_is_averaged_cross_spectrum(self, crystal, calc, kv):
        freqs, inten, phase = calc.calculate_kgrid_browse(
            kv, welch_segments=3, chiral=True, chiral_axis='z')
        _, want_i, want_p = browse_oracle(crystal, kv, 3, 'hann',
                                          comp_pair=(0, 1))
        assert phase is not None and phase.shape == inten.shape
        assert np.abs(inten - want_i).max() <= 1e-5 * want_i.max()
        # phase is exact except where |c12| underflows noise
        strong = want_i > 1e-3 * want_i.max()
        assert np.abs((phase - want_p)[strong]).max() <= 1e-3
        assert np.all(np.abs(phase) <= np.pi / 2 + 1e-6)

    def test_incoherent_sums_group_welch(self, crystal, calc, kv):
        _, inten, _ = calc.calculate_kgrid_browse(
            kv, welch_segments=2, basis_atom_types=[1, 2],
            summation_mode='incoherent')
        total = None
        for t in (1, 2):
            idx = np.flatnonzero(crystal.types == t)
            _, part, _ = browse_oracle(crystal, kv, 2, 'hann', group_idx=idx)
            total = part if total is None else total + part
        assert np.abs(inten - total).max() <= 1e-5 * total.max()

    def test_oversize_group_streams_and_matches(self, crystal, kv):
        small = SEDCalculator(crystal, nx=3, ny=3, nz=2,
                              max_device_bytes=1_000)
        _, inten, _ = small.calculate_kgrid_browse(kv, welch_segments=2)
        _, want, _ = browse_oracle(crystal, kv, 2, 'hann')
        assert np.abs(inten - want).max() <= 1e-5 * want.max()

    def test_gridded_engine_rejected(self, calc, kv):
        with pytest.raises(ValueError, match="direct engine"):
            calc.calculate_kgrid_browse(kv, welch_segments=2,
                                        engine='gridded',
                                        k_grid_shape=(3, 3))

    def test_bad_segments_rejected(self, calc, kv):
        with pytest.raises(ValueError, match="welch_segments"):
            calc.calculate_kgrid_browse(kv, welch_segments=0)
        with pytest.raises(ValueError, match="frames per"):
            calc.calculate_kgrid_browse(kv, welch_segments=1000)


class TestPeaksWelch:
    def test_peaks_come_from_welch_planes(self, crystal, calc, kv):
        from psa_tpu.core.calculator import peaks_np
        pf, ph, pw = calc.calculate_kgrid_peaks(kv, welch_segments=3,
                                                n_peaks=2, engine='direct')
        _, want_planes, _ = browse_oracle(crystal, kv, 3, 'hann')
        seg = crystal.n_frames // 3
        freqs = np.fft.fftfreq(seg, d=0.02)
        wf, wh, ww = peaks_np(want_planes.astype(np.float32),
                              freqs[freqs >= 0].astype(np.float32),
                              n_peaks=2, exclusion_bins=4)
        np.testing.assert_allclose(pf, wf, atol=1e-6)
        assert np.abs(ph - wh).max() <= 1e-5 * wh.max()

    def test_auto_engine_stays_direct_with_welch(self, calc, kv):
        # auto must not route welch sweeps onto the gridded engine
        pf, _, _ = calc.calculate_kgrid_peaks(kv, welch_segments=2,
                                              engine='auto')
        assert pf.shape[1] == len(kv)


@pytest.mark.slow
class TestShardedWelch:
    """Mesh forms vs the single-chip Welch paths on the virtual mesh."""

    def test_browse_sharded_matches(self, crystal, calc, kv):
        from psa_tpu.parallel import make_mesh
        mesh = make_mesh(shape=(2, 2, 2))
        f1, i1, _ = calc.calculate_kgrid_browse(kv, welch_segments=3)
        f2, i2, _ = calc.calculate_kgrid_browse_sharded(
            mesh, kv, welch_segments=3)
        np.testing.assert_allclose(f2, f1, atol=0)
        assert np.abs(i2 - i1).max() <= 1e-5 * i1.max()

    def test_browse_sharded_chiral_matches(self, crystal, calc, kv):
        from psa_tpu.parallel import make_mesh
        mesh = make_mesh(shape=(2, 2, 2))
        _, i1, p1 = calc.calculate_kgrid_browse(kv, welch_segments=3,
                                                chiral=True)
        _, i2, p2 = calc.calculate_kgrid_browse_sharded(
            mesh, kv, welch_segments=3, chiral=True)
        assert np.abs(i2 - i1).max() <= 1e-5 * i1.max()
        strong = i1 > 1e-3 * i1.max()
        assert np.abs((p2 - p1)[strong]).max() <= 1e-3

    def test_peaks_sharded_matches(self, crystal, calc, kv):
        from psa_tpu.parallel import make_mesh
        mesh = make_mesh(shape=(2, 2, 2))
        p1 = calc.calculate_kgrid_peaks(kv, welch_segments=3, n_peaks=2,
                                        engine='direct')
        p2 = calc.calculate_kgrid_peaks_sharded(mesh, kv, welch_segments=3,
                                                n_peaks=2)
        for got, want in zip(p2, p1):
            assert np.abs(got - want).max() <= 1e-4 * max(want.max(), 1.0)

    def test_incoherent_browse_sharded_matches(self, crystal, calc, kv):
        from psa_tpu.parallel import make_mesh
        mesh = make_mesh(shape=(2, 2, 2))
        _, i1, _ = calc.calculate_kgrid_browse(
            kv, welch_segments=2, basis_atom_types=[1, 2],
            summation_mode='incoherent')
        _, i2, _ = calc.calculate_kgrid_browse_sharded(
            mesh, kv, welch_segments=2, basis_atom_types=[1, 2],
            summation_mode='incoherent')
        assert np.abs(i2 - i1).max() <= 1e-5 * i1.max()


class TestDSFWelch:
    def _chain(self):
        traj = make_chain_trajectory(n_cells=12, n_frames=64, dt_ps=0.02,
                                     a=2.5, omega_max_thz=7.0, seed=4)
        calc = SEDCalculator(traj, nx=12, ny=1, nz=1)
        m = np.arange(1, 7)
        kv = np.zeros((len(m), 3), dtype=np.float32)
        kv[:, 0] = 2 * np.pi * m / (12 * 2.5)
        return calc, instantaneous.nearest_commensurate(kv,
                                                        traj.box_lengths)

    def _dsf_oracle(self, traj, kv, segments, window, dt_ps):
        n_t, n_atoms = traj.positions.shape[:2]
        ang = np.einsum('tac,kc->tak', traj.positions.astype(np.float64),
                        kv.astype(np.float64))
        ph = np.exp(1j * ang)
        rho = ph.sum(axis=1)                               # (n_t, K)
        seg = n_t // segments
        rho = rho[:seg * segments].reshape(segments, seg, -1)
        if window == 'hann':
            w = 1.0 - np.cos(2 * np.pi * np.arange(seg) / seg)
            rho = rho * w[None, :, None]
        spec = np.fft.fft(rho, axis=1) / seg
        mask = np.fft.fftfreq(seg, d=dt_ps) >= 0
        return np.mean(np.abs(spec[:, mask]) ** 2, axis=0) / n_atoms

    @pytest.mark.parametrize("window", ["rect", "hann"])
    def test_s_plane_matches_segment_oracle(self, window):
        calc, kv = self._chain()
        freqs, s, _, _ = calc.calculate_dsf(kv, welch_segments=4,
                                            welch_window=window)
        want = self._dsf_oracle(calc.traj, kv, 4, window, calc.dt_ps)
        assert s.shape == want.shape
        assert np.abs(s - want).max() <= 1e-5 * want.max()
        seg = calc.traj.n_frames // 4
        f = np.fft.fftfreq(seg, d=calc.dt_ps)
        np.testing.assert_allclose(freqs, f[f >= 0], rtol=1e-6)

    def test_single_segment_rect_matches_default(self):
        calc, kv = self._chain()
        f0, s0, cl0, ct0 = calc.calculate_dsf(kv)
        f1, s1, cl1, ct1 = calc.calculate_dsf(kv, welch_segments=1,
                                              welch_window='rect')
        np.testing.assert_allclose(f1, f0, atol=0)
        for got, want in ((s1, s0), (cl1, cl0), (ct1, ct0)):
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-12)

    @pytest.mark.slow
    def test_sharded_matches_single_chip(self):
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        rf, rs, rcl, rct = calc.calculate_dsf(kv, welch_segments=4)
        sf, ss, scl, sct = calc.calculate_dsf_sharded(mesh, kv,
                                                      welch_segments=4)
        np.testing.assert_allclose(sf, rf, atol=0)
        for got, want in ((ss, rs), (scl, rcl), (sct, rct)):
            assert np.abs(got - want).max() <= 1e-5 * max(want.max(), 1.0)
