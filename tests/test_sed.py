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
    s = SED(np.ones((4, 3), dtype=np.float32), np.zeros(4), np.zeros(3),
            np.zeros((3, 3)), is_complex=False)
    assert not np.iscomplexobj(s.sed)
    expected = np.sum(np.abs(s.sed) ** 2, axis=-1)
    np.testing.assert_allclose(s.intensity, expected)
