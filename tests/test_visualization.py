"""SEDPlotter smoke + behavior tests under the Agg backend.

The reference README listed tests/test_visualization.py that never existed
(reference README.md:222-226); this is that suite.
"""
import numpy as np
import pytest

from psa_tpu.core.sed import SED
from psa_tpu.visualization.sed_plotter import (SEDPlotter, VALID_PLOT_TYPES,
                                               apply_intensity_scale)
from psa_tpu.visualization import styles


def make_path_sed(n_freq=32, n_k=10, with_phase=False):
    rng = np.random.default_rng(0)
    sed = (rng.normal(size=(n_freq, n_k, 3))
           + 1j * rng.normal(size=(n_freq, n_k, 3))).astype(np.complex64)
    freqs = np.fft.fftfreq(n_freq, d=0.05)
    k_points = np.linspace(0, 2, n_k).astype(np.float32)
    k_vectors = np.outer(k_points, [1, 0, 0]).astype(np.float32)
    phase = (rng.uniform(-np.pi / 2, np.pi / 2, size=(n_freq, n_k)).astype(np.float32)
             if with_phase else None)
    return SED(sed, freqs, k_points, k_vectors, phase=phase)


def make_grid_sed(n_freq=16, n1=6, n2=5):
    rng = np.random.default_rng(1)
    kx = np.linspace(-1, 1, n1, dtype=np.float32)
    ky = np.linspace(-1, 1, n2, dtype=np.float32)
    kv = np.stack([np.repeat(kx, n2), np.tile(ky, n1),
                   np.zeros(n1 * n2, np.float32)], axis=1)
    sed = (rng.normal(size=(n_freq, n1 * n2, 3))
           + 1j * rng.normal(size=(n_freq, n1 * n2, 3))).astype(np.complex64)
    return SED(sed, np.fft.fftfreq(n_freq, d=0.05), np.array([]), kv,
               k_grid_shape=(n1, n2))


class TestScaling:
    def test_linear_passthrough(self):
        x = np.array([1.0, 4.0])
        out, label = apply_intensity_scale(x, 'linear')
        np.testing.assert_array_equal(out, x)
        assert 'Intensity' in label

    @pytest.mark.parametrize("scale,fn,label", [
        ('log', lambda x: np.log10(np.maximum(x, 1e-12)), 'Log10'),
        ('sqrt', np.sqrt, 'Sqrt'),
        ('dsqrt', lambda x: np.sqrt(np.sqrt(x)), 'DSqrt'),
    ])
    def test_scales(self, scale, fn, label):
        x = np.array([0.01, 1.0, 100.0])
        out, lbl = apply_intensity_scale(x, scale)
        np.testing.assert_allclose(out, fn(x), rtol=1e-6)
        assert label in lbl

    def test_unknown_scale_falls_back(self):
        x = np.array([1.0])
        out, _ = apply_intensity_scale(x, 'bogus')
        np.testing.assert_array_equal(out, x)


class TestPlotGeneration:
    @pytest.mark.parametrize("theme", ['light', 'dark'])
    def test_2d_intensity(self, tmp_path, theme):
        out = tmp_path / f"i_{theme}.png"
        SEDPlotter(make_path_sed(), '2d_intensity', str(out),
                   max_freq=8.0, intensity_scale='dsqrt', theme=theme,
                   highlight_region={'k_point_target': 1.0,
                                     'freq_point_target': 3.0}).generate_plot()
        assert out.exists() and out.stat().st_size > 5000

    def test_2d_phase(self, tmp_path):
        out = tmp_path / "p.png"
        SEDPlotter(make_path_sed(with_phase=True), '2d_phase', str(out),
                   cmap='twilight').generate_plot()
        assert out.exists()

    def test_2d_phase_without_phase_is_noop(self, tmp_path):
        out = tmp_path / "none.png"
        SEDPlotter(make_path_sed(with_phase=False), '2d_phase', str(out)).generate_plot()
        assert not out.exists()   # warned, produced nothing

    def test_3d_heatmap(self, tmp_path):
        out = tmp_path / "h.png"
        SEDPlotter(make_grid_sed(), '3d_heatmap', str(out),
                   heatmap_target_freq_thz=2.0, heatmap_plane='xy').generate_plot()
        assert out.exists()

    def test_3d_heatmap_requires_grid_shape(self, tmp_path):
        with pytest.raises(ValueError, match="k_grid_shape"):
            SEDPlotter(make_path_sed(), '3d_heatmap', str(tmp_path / "x.png")).generate_plot()

    def test_3d_heatmap_bad_plane(self, tmp_path):
        with pytest.raises(ValueError, match="heatmap_plane"):
            SEDPlotter(make_grid_sed(), '3d_heatmap', str(tmp_path / "x.png"),
                       heatmap_plane='ab').generate_plot()

    @pytest.mark.parametrize("kwargs", [
        {'k_index': 3}, {'freq_index': 5},
    ])
    def test_1d_slice(self, tmp_path, kwargs):
        out = tmp_path / "s.png"
        SEDPlotter(make_path_sed(), '1d_slice', str(out), **kwargs).generate_plot()
        assert out.exists()

    def test_1d_slice_requires_an_index(self, tmp_path):
        out = tmp_path / "no.png"
        SEDPlotter(make_path_sed(), '1d_slice', str(out)).generate_plot()
        assert not out.exists()

    def test_1d_slice_out_of_bounds_index(self, tmp_path):
        out = tmp_path / "oob.png"
        SEDPlotter(make_path_sed(), '1d_slice', str(out), k_index=99).generate_plot()
        assert not out.exists()

    def test_frequency_slice(self, tmp_path):
        out = tmp_path / "f.png"
        SEDPlotter(make_path_sed(), 'frequency_slice', str(out),
                   target_frequency=4.0, intensity_scale='log').generate_plot()
        assert out.exists()

    def test_invalid_plot_type(self, tmp_path):
        with pytest.raises(ValueError, match="Invalid plot_type"):
            SEDPlotter(make_path_sed(), 'nope', str(tmp_path / "x.png")).generate_plot()

    def test_incoherent_sed_plots(self, tmp_path):
        """Float (incoherent) SED storage plots through the same paths."""
        s = make_path_sed()
        inc = SED(np.abs(s.sed[:, :, 0]).astype(np.float32) ** 2, s.freqs,
                  s.k_points, s.k_vectors, is_complex=False)
        out = tmp_path / "inc.png"
        SEDPlotter(inc, '2d_intensity', str(out)).generate_plot()
        assert out.exists()

    def test_vmin_vmax_percentiles(self, tmp_path):
        out = tmp_path / "pct.png"
        SEDPlotter(make_path_sed(), '2d_intensity', str(out),
                   vmin_percentile=5.0, vmax_percentile=95.0).generate_plot()
        assert out.exists()


class TestStyles:
    def test_apply_known_schemes(self):
        for scheme in styles.COLOR_SCHEMES:
            styles.apply_style(color_scheme=scheme)
        styles.reset_style()

    def test_unknown_scheme_raises(self):
        with pytest.raises(ValueError, match="Unknown color scheme"):
            styles.apply_style(color_scheme='nope')

    def test_cycle_roundtrip(self):
        orig = styles.get_color_cycle()
        styles.set_color_cycle(['#112233', '#445566'])
        assert styles.get_color_cycle()[:2] == ['#112233', '#445566']
        styles.set_color_cycle(orig)

    def test_colormap_and_params(self):
        assert styles.get_colormap('viridis') is not None
        params = styles.get_style_params()
        assert 'figure.figsize' in params
