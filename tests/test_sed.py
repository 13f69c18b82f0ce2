"""SED container: intensity, save/load round-trips (mirrors reference tests/test_sed.py)."""
import numpy as np
import pytest

from psa_tpu.core.sed import SED


def make_sed(n_freq=8, n_k=5, with_phase=False, with_grid=False):
    rng = np.random.default_rng(1)
    sed = (rng.normal(size=(n_freq, n_k, 3))
           + 1j * rng.normal(size=(n_freq, n_k, 3))).astype(np.complex64)
    freqs = np.fft.fftfreq(n_freq, d=0.01)
    k_points = np.linspace(0, 2, n_k).astype(np.float32)
    k_vectors = np.outer(k_points, [1, 0, 0]).astype(np.float32)
    phase = rng.normal(size=(n_freq, n_k)).astype(np.float32) if with_phase else None
    grid = (n_k, 1) if with_grid else None
    return SED(sed, freqs, k_points, k_vectors, k_grid_shape=grid, phase=phase)


def test_intensity_matches_hand_computed():
    s = make_sed()
    expected = np.sum(np.abs(s.sed) ** 2, axis=-1)
    np.testing.assert_allclose(s.intensity, expected, atol=1e-6)
    assert s.intensity.dtype == np.float32


def test_intensity_empty():
    s = SED(np.array([], dtype=np.complex64).reshape(0, 0, 3),
            np.array([]), np.array([]), np.zeros((0, 3)))
    assert s.intensity.shape == (0, 0)


@pytest.mark.parametrize("with_phase", [False, True])
@pytest.mark.parametrize("with_grid", [False, True])
def test_save_load_roundtrip(tmp_path, with_phase, with_grid):
    s = make_sed(with_phase=with_phase, with_grid=with_grid)
    base = tmp_path / "sed_test"
    s.save(base)
    loaded = SED.load(base)
    np.testing.assert_allclose(loaded.sed, s.sed, atol=1e-6)
    np.testing.assert_allclose(loaded.freqs, s.freqs, atol=1e-6)
    np.testing.assert_allclose(loaded.k_points, s.k_points, atol=1e-6)
    np.testing.assert_allclose(loaded.k_vectors, s.k_vectors, atol=1e-6)
    if with_phase:
        np.testing.assert_allclose(loaded.phase, s.phase, atol=1e-6)
    else:
        assert loaded.phase is None
    if with_grid:
        assert loaded.k_grid_shape == s.k_grid_shape
    else:
        assert loaded.k_grid_shape is None
    assert loaded.is_complex


def test_save_load_dotted_basename(tmp_path):
    """Base names containing dots must round-trip (the reference's
    Path.with_suffix clobbered '1.00_0.00'-style labels; fixed here)."""
    s = make_sed()
    base = tmp_path / "sed_data_regular_1.00_0.00"
    s.save(base)
    loaded = SED.load(base)
    np.testing.assert_allclose(loaded.sed, s.sed, atol=1e-6)


def test_load_legacy_reference_layout(tmp_path):
    """Files written with the reference's with_suffix naming still load."""
    s = make_sed()
    base = tmp_path / "legacy"
    np.save(base.with_suffix('.sed.npy'), s.sed)
    np.save(base.with_suffix('.freqs.npy'), s.freqs)
    np.save(base.with_suffix('.k_points.npy'), s.k_points)
    np.save(base.with_suffix('.k_vectors.npy'), s.k_vectors)
    loaded = SED.load(base)
    np.testing.assert_allclose(loaded.sed, s.sed, atol=1e-6)


def test_load_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        SED.load(tmp_path / "nonexistent")


def test_incoherent_load_infers_real():
    s = SED(np.arange(12, dtype=np.float32).reshape(4, 3), np.zeros(4),
            np.zeros(3), np.zeros((3, 3)), is_complex=False)
    assert not np.iscomplexobj(s.sed)
    # incoherent storage already IS the intensity: returned as-is (the
    # reference property would have mis-reduced it over the k axis)
    np.testing.assert_allclose(s.intensity, s.sed)


class TestAverageSeds:
    """Ensemble averaging over independent runs (psa_tpu extension)."""

    def _members(self, m=3, n_freq=8, n_k=5, seed=7):
        rng = np.random.default_rng(seed)
        base = make_sed(n_freq, n_k)
        out = []
        for _ in range(m):
            sed = (rng.normal(size=(n_freq, n_k, 3))
                   + 1j * rng.normal(size=(n_freq, n_k, 3))).astype(np.complex64)
            out.append(SED(sed, base.freqs, base.k_points, base.k_vectors))
        return out

    def test_uniform_mean_of_intensities(self):
        from psa_tpu import average_seds
        members = self._members()
        avg = average_seds(members)
        expected = np.mean([s.intensity for s in members], axis=0)
        assert not avg.is_complex
        np.testing.assert_allclose(avg.intensity, expected, rtol=1e-6)
        assert avg.trajectory_metadata['ensemble_members'] == 3
        np.testing.assert_array_equal(avg.freqs, members[0].freqs)

    def test_mixed_complex_and_incoherent_members(self):
        from psa_tpu import average_seds
        members = self._members(m=2)
        incoh = SED(members[0].intensity, members[0].freqs,
                    members[0].k_points, members[0].k_vectors,
                    is_complex=False)
        avg = average_seds([members[1], incoh])
        expected = (members[1].intensity + members[0].intensity) / 2
        np.testing.assert_allclose(avg.intensity, expected, rtol=1e-6)

    def test_weights(self):
        from psa_tpu import average_seds
        members = self._members(m=2)
        avg = average_seds(members, weights=[3.0, 1.0])
        expected = 0.75 * members[0].intensity + 0.25 * members[1].intensity
        np.testing.assert_allclose(avg.intensity, expected, rtol=1e-6)
        for bad in ([1.0], [1.0, -1.0], [0.0, 0.0]):
            with pytest.raises(ValueError, match="weights"):
                average_seds(members, weights=bad)

    def test_axis_mismatch_rejected(self):
        from psa_tpu import average_seds
        a, b = self._members(m=2)
        with pytest.raises(ValueError, match="frequency axis"):
            average_seds([a, SED(b.sed, b.freqs + 1.0, b.k_points, b.k_vectors)])
        with pytest.raises(ValueError, match="k-vectors"):
            average_seds([a, SED(b.sed, b.freqs, b.k_points, b.k_vectors + 1.0)])
        with pytest.raises(ValueError, match="k_grid_shape"):
            average_seds([a, SED(b.sed, b.freqs, b.k_points, b.k_vectors,
                                 k_grid_shape=(5, 1))])
        with pytest.raises(ValueError, match="at least one"):
            average_seds([])

    def test_chiral_cross_spectrum_recovers_common_phase_difference(self):
        """Members share Δφ = ∠Z_x − ∠Z_y but carry random per-run global
        phases; the cross-spectral estimator must recover Δφ exactly while
        a naive amplitude average would cancel."""
        from psa_tpu import average_seds
        rng = np.random.default_rng(3)
        n_freq, n_k = 6, 4
        base = make_sed(n_freq, n_k)
        delta = 0.4  # true phase difference, inside [-pi/2, pi/2]
        members = []
        for _ in range(5):
            g = np.exp(1j * rng.uniform(-np.pi, np.pi,
                                        size=(n_freq, n_k))).astype(np.complex64)
            amp = rng.uniform(0.5, 2.0, size=(n_freq, n_k))
            sed = np.zeros((n_freq, n_k, 3), np.complex64)
            sed[..., 0] = g * amp * np.exp(1j * delta)
            sed[..., 1] = g * amp
            sed[..., 2] = 0
            members.append(SED(sed, base.freqs, base.k_points, base.k_vectors))
        avg = average_seds(members, chiral_pair=(0, 1))
        np.testing.assert_allclose(avg.phase, delta, atol=1e-6)

    def test_chiral_single_member_matches_option_c(self):
        from psa_tpu import average_seds
        from psa_tpu.ops.spectral import chiral_phase
        (s,) = self._members(m=1)
        avg = average_seds([s], chiral_pair=(1, 2))
        z1, z2 = s.sed[..., 1], s.sed[..., 2]
        expected = np.asarray(chiral_phase(
            z1.real, z1.imag, z2.real, z2.imag, angle_range_opt='C'))
        np.testing.assert_allclose(avg.phase, expected, atol=1e-5)

    def test_chiral_requires_complex_members(self):
        from psa_tpu import average_seds
        (s,) = self._members(m=1)
        incoh = SED(s.intensity, s.freqs, s.k_points, s.k_vectors,
                    is_complex=False)
        with pytest.raises(ValueError, match="complex"):
            average_seds([incoh], chiral_pair=(0, 1))
