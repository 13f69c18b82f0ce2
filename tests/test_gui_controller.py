"""GUI controller + export backends, headless (no display required)."""
import numpy as np
import pytest

from psa_tpu.gui.controller import (AnalysisController, apply_scale,
                                    parse_direction_input, CHIRAL_AXIS_COMPONENTS)
from psa_tpu.gui import export
from psa_tpu.io.writer import out_to_qdump
from psa_tpu.models import make_chain_trajectory


@pytest.fixture
def loaded(tmp_path):
    """Controller with a chain trajectory loaded from a real dump file."""
    traj = make_chain_trajectory(n_cells=12, n_frames=64, dt_ps=0.02,
                                 a=2.5, omega_max_thz=6.0)
    dump = tmp_path / "chain.dump"
    with open(dump, "w") as f:
        for t in range(traj.n_frames):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{traj.n_atoms}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                f.write(f"0.0 {traj.box_matrix[d, d]:.6f}\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for a_ in range(traj.n_atoms):
                p, v = traj.positions[t, a_], traj.velocities[t, a_]
                f.write(f"{a_+1} 1 {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
    ctrl = AnalysisController()
    ctrl.load_trajectory(str(dump), dt=0.02, file_format='lammps',
                         nx=12, ny=1, nz=1)
    return ctrl


class TestParseDirectionInput:
    @pytest.mark.parametrize("text,expected", [
        ("[1,0,0]", [1, 0, 0]),
        ("(0, 1, 0)", (0, 1, 0)),
        ("45.0", 45.0),
        ("x", "x"),
        ("110", 110),                       # literal int -> angle semantics
        ("{'h': 1, 'k': 1, 'l': 0}", {'h': 1, 'k': 1, 'l': 0}),
    ])
    def test_forms(self, text, expected):
        assert parse_direction_input(text) == expected

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            parse_direction_input("  ")


def test_chiral_axis_component_pairs():
    # axis -> perpendicular polarization components (reference psa_gui.py:976-982)
    assert CHIRAL_AXIS_COMPONENTS == {'x': (1, 2), 'y': (0, 2), 'z': (0, 1)}


def test_cache_detection(loaded, tmp_path):
    assert loaded.has_cache(str(tmp_path / "chain.dump"))  # load wrote the cache
    assert not loaded.has_cache(str(tmp_path / "other.dump"))


class TestKPathFlow:
    def test_compute_and_click(self, loaded):
        sed = loaded.compute_kpath_sed("x", n_k=16, bz_coverage=0.5)
        assert not sed.is_complex         # device-reduced intensity planes
        k, f, c = loaded.kpath_plot_arrays(scale='dsqrt', max_freq=8.0)
        assert c.shape == (len(f), len(k))
        assert np.all(f >= 0) and np.all(f <= 8.0)
        ksel, wsel = loaded.select_nearest(0.62, 5.1)
        assert abs(ksel - 0.62) < np.diff(k)[0]
        assert loaded.selected_point == (ksel, wsel)

    def test_chiral_forces_coherent(self, loaded):
        sed = loaded.compute_kpath_sed("x", n_k=8, bz_coverage=0.5,
                                       summation_mode='incoherent', chiral=True,
                                       chiral_axis='z')
        assert sed.phase is not None      # forced coherent -> phase computed
        assert sed.phase.shape == sed.sed.shape  # same filtered planes
        full = loaded.compute_kpath_sed("x", n_k=8, bz_coverage=0.5,
                                        summation_mode='incoherent',
                                        chiral=True, chiral_axis='z',
                                        reduced=False)
        assert full.is_complex            # full path keeps complex amplitudes
        assert full.phase.shape == full.sed.shape[:2]

    def test_reduced_kpath_matches_full(self, loaded):
        """The device-reduced k-path display (VERDICT r2 item 6) must show
        the same intensity and phase planes as the full complex flow.  The
        display default is exact float32 (round-5: the f16 readback is
        opt-in via controller.readback_dtype / PSA_DISPLAY_READBACK, see
        test_f16_display_optin; quantization bounds in tests/test_readback)."""
        loaded.compute_kpath_sed("x", n_k=12, bz_coverage=0.5, chiral=True)
        k1, f1, c1 = loaded.kpath_plot_arrays(scale='linear')
        _, fp1, p1 = loaded.kpath_plot_arrays(show_phase=True)
        loaded.compute_kpath_sed("x", n_k=12, bz_coverage=0.5, chiral=True,
                                 reduced=False)
        k2, f2, c2 = loaded.kpath_plot_arrays(scale='linear')
        _, fp2, p2 = loaded.kpath_plot_arrays(show_phase=True)
        np.testing.assert_allclose(f1, f2, atol=0)
        np.testing.assert_allclose(c1, c2, rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(p1, p2, atol=1e-5)

    def test_f16_display_optin(self, loaded):
        """Opting into the f16 readback keeps every display pixel within
        the sqrt-domain bound: ≤ ~2⁻¹⁰ RELATIVE error for pixels ≥ 4e-9 of
        the plane max — so log/dsqrt backgrounds don't posterize (round-4
        VERDICT items 1-2)."""
        exact = loaded.compute_kpath_sed("x", n_k=12, bz_coverage=0.5).sed
        loaded.readback_dtype = 'float16'
        try:
            quant = loaded.compute_kpath_sed("x", n_k=12,
                                             bz_coverage=0.5).sed
        finally:
            loaded.readback_dtype = 'float32'
        floor = 4e-9 * exact.max()
        bright = exact >= floor
        rel = np.abs(quant[bright] - exact[bright]) / exact[bright]
        assert rel.max() <= 2.0 ** -9        # one ulp slack over 2^-10
        assert np.abs(quant[~bright] - exact[~bright]).max() <= floor

    def test_phase_plot_arrays(self, loaded):
        loaded.compute_kpath_sed("x", n_k=8, bz_coverage=0.5, chiral=True)
        _, f, c = loaded.kpath_plot_arrays(show_phase=True)
        assert np.all(np.abs(c) <= np.pi / 2 + 1e-6)


class TestKGridFlow:
    def test_grid_state(self, loaded):
        kg = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 6, 5,
                                      max_freq=10.0)
        assert kg.sed.k_grid_shape == (6, 5)
        assert kg.intensity.shape == (len(kg.freqs), 30)
        assert np.all(kg.freqs >= 0) and np.all(kg.freqs <= 10.0)
        s = kg.slice_at(0)
        assert s.shape == (5, 6)          # transposed for pcolormesh
        vmin, vmax = kg.global_vrange(scale='sqrt')
        assert vmax >= vmin
        # cache hit returns identical object
        assert kg.global_vrange(scale='sqrt') == (vmin, vmax)

    def test_peaks_state(self, loaded):
        pk = loaded.compute_kgrid_peaks('xy', (-1, 1), (-1, 1), 6, 5,
                                        n_peaks=2, max_freq=10.0)
        assert pk.freq_surfaces.shape == (2, 6, 5)
        assert pk.intensity_surfaces.shape == (2, 6, 5)
        assert pk.linewidth_surfaces.shape == (2, 6, 5)
        assert pk.surface(0, 'freq').shape == (5, 6)   # plot orientation
        assert np.all(pk.freq_surfaces >= 0)
        assert np.all(pk.freq_surfaces <= 10.0 + 1e-6)
        assert pk.labels == ('k_x', 'k_y')
        # rank order: top peak carries at least rank-2's intensity
        assert np.all(pk.intensity_surfaces[0] >= pk.intensity_surfaces[1])

    def test_last_grid_kind_tracks_most_recent(self, loaded):
        """CSV export follows the most recently computed grid result
        (ADVICE r2: browse state must not shadow a newer peak surface)."""
        assert loaded.last_grid_kind is None
        loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 5)
        assert loaded.last_grid_kind == 'browse'
        loaded.compute_kgrid_peaks('xy', (-1, 1), (-1, 1), 5, 5)
        assert loaded.last_grid_kind == 'peaks'
        loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 5)
        assert loaded.last_grid_kind == 'browse'

    def test_grid_lt_polarization(self, loaded):
        """L/T split on the grid: a longitudinal chain (motion ∥ x) puts
        everything in I_L along k̂=x̂ columns; L+T = total browse intensity."""
        total = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 4,
                                         max_freq=10.0)
        ti = total.intensity.copy()
        lg = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 4,
                                      max_freq=10.0,
                                      polarization='longitudinal')
        assert loaded.last_grid_kind == 'browse'
        il = lg.intensity.copy()
        tr = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 4,
                                      max_freq=10.0,
                                      polarization='transverse')
        it = tr.intensity.copy()
        assert il.shape == ti.shape == it.shape
        np.testing.assert_allclose(il + it, ti, atol=1e-5 * ti.max())
        # pure-x motion: on the k_y axis (k ⟂ motion) everything transverse
        # (grid is comp1-outer row-major: flat index = i1 * n_k2 + i2)
        kv = lg.sed.k_vectors.reshape(5, 4, 3)
        i1 = int(np.flatnonzero(np.abs(kv[:, 0, 0]) < 1e-9)[0])  # kx == 0 row
        col = i1 * 4 + np.arange(4)            # ky ∈ {-1,-1/3,1/3,1}, no Γ
        assert il[:, col].max() <= 1e-6 * ti.max()

    def test_grid_lt_rejects_bad_combos(self, loaded):
        with pytest.raises(ValueError, match="chiral"):
            loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 4, 4,
                                     chiral=True, polarization='transverse')
        with pytest.raises(ValueError, match="direct engine"):
            loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 4, 4,
                                     engine='gridded',
                                     polarization='longitudinal')
        with pytest.raises(ValueError, match="reduced"):
            loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 4, 4,
                                     reduced=False, polarization='transverse')

    def test_dos(self, loaded):
        freqs, dos = loaded.compute_dos(max_freq=10.0)
        assert dos.shape == (1, len(freqs))
        assert np.all(freqs >= 0) and np.all(freqs <= 10.0)
        assert np.all(dos >= 0) and dos.max() > 0
        # all atoms are type 1 in this fixture: the type-1 partial IS the total
        _, per_type = loaded.compute_dos(basis_atom_types=[1], max_freq=10.0)
        np.testing.assert_allclose(per_type, dos, rtol=1e-5)

    def test_liquid_curves(self, loaded):
        """The Liquid button's four curve observables come back plottable
        and physically sane on the chain fixture."""
        x, sk, xl, yl = loaded.compute_liquid_curve(
            'sk', direction_text='x', n_k=8, bz_coverage=0.5)
        assert sk.shape == (1, len(x)) and '2π' in xl and yl == 'S(k)'
        assert np.all(sk >= 0)
        r, g, xl, _ = loaded.compute_liquid_curve('rdf')
        assert g.shape == (1, len(r)) and xl.startswith('r')
        # chain with a = 2.5: no pairs below the nearest-neighbor distance
        assert g[0][r < 2.0].max() == 0.0 and g[0].max() > 0
        lags, msd, _, _ = loaded.compute_liquid_curve('msd')
        assert msd.shape == (1, len(lags)) and lags[0] == 0.0
        lags, vacf, _, _ = loaded.compute_liquid_curve('vacf')
        # VACF(0) = <|v|^2> is the maximum for a stationary signal
        assert vacf[0, 0] > 0
        assert vacf[0, 0] >= np.abs(vacf[0, 1:]).max() - 1e-6
        # state tracks the most recent compute for CSV export
        assert loaded.last_compute == 'liquid'
        assert loaded.liquid.kind == 'vacf'
        assert loaded.liquid.curve_labels == ('total',)
        # F_s decay curves: one per sampled k, starting at 1
        lags, fs, _, yl = loaded.compute_liquid_curve(
            'isf_self', direction_text='x', n_k=8, bz_coverage=0.5)
        assert yl == 'F_s(k,τ)' and fs.shape[1] == len(lags)
        np.testing.assert_allclose(fs[:, 0], 1.0, rtol=1e-5)
        assert all(lab.startswith('k = ')
                   for lab in loaded.liquid.curve_labels)
        with pytest.raises(ValueError):
            loaded.compute_liquid_curve('nope')

    def test_liquid_csv_export(self, loaded, tmp_path):
        from psa_tpu.gui import export
        loaded.compute_liquid_curve('rdf')
        out = export.export_liquid_csv(loaded.liquid, tmp_path / "liq.csv")
        lines = out.read_text().splitlines()
        assert lines[0].startswith("# observable=rdf")
        assert lines[1] == "r,total"
        data = np.loadtxt(out, delimiter=',', skiprows=2)
        assert data.shape == (len(loaded.liquid.x), 2)
        np.testing.assert_allclose(data[:, 1], loaded.liquid.curves[0],
                                   rtol=1e-6)

    def test_grid_chiral_phase_same_mask(self, loaded):
        """Phase must be filtered with the same freq mask as intensity
        (the reference's off-by-mask bug, psa_gui.py:2382)."""
        kg = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 4, 4,
                                      max_freq=6.0, chiral=True)
        assert kg.phase is not None
        assert kg.phase.shape == kg.intensity.shape


class TestISEDFlow:
    def test_requires_selection(self, loaded):
        loaded.compute_kpath_sed("x", n_k=8, bz_coverage=0.5)
        with pytest.raises(RuntimeError, match="Select"):
            loaded.reconstruct_ised("x", char_len=2.5, n_frames=4)

    def test_full_flow(self, loaded, tmp_path):
        loaded.compute_kpath_sed("x", n_k=16, bz_coverage=0.5)
        loaded.select_nearest(0.6, 4.0)
        dump = loaded.reconstruct_ised("x", char_len=2.5, n_k=12,
                                       bz_coverage=0.5, n_frames=5,
                                       out_dir=tmp_path / "ised")
        assert dump.exists()
        pos, types, box = loaded.load_ised_motion()
        assert pos.shape == (5, 12, 3)
        loaded.cleanup()


class TestExports:
    def test_npy_and_csv(self, loaded, tmp_path):
        sed = loaded.compute_kpath_sed("x", n_k=8, bz_coverage=0.5, chiral=True)
        files = export.export_npy_set(sed, tmp_path / "exp" / "sed")
        assert all(f.exists() for f in files)
        csv = export.export_kpath_csv(sed, tmp_path / "kpath.csv")
        import pandas as pd
        df = pd.read_csv(csv)
        assert 'frequency_THz' in df.columns
        assert any(c.startswith('k_') for c in df.columns)
        assert any(c.startswith('phase_k_') for c in df.columns)

    def test_kgrid_csv_and_gif(self, loaded, tmp_path):
        kg = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 4, 4, max_freq=8.0)
        csv = export.export_kgrid_csv(kg, tmp_path / "grid.csv")
        import pandas as pd
        df = pd.read_csv(csv)
        assert set(df.columns) >= {'frequency_THz', 'k_x', 'k_y', 'intensity'}
        assert len(df) == len(kg.freqs) * 16
        gif = export.export_kgrid_gif(kg, tmp_path / "grid.gif", max_frames=5)
        assert gif.exists() and gif.stat().st_size > 1000

    def test_peaks_csv(self, loaded, tmp_path):
        pk = loaded.compute_kgrid_peaks('xy', (-1, 1), (-1, 1), 4, 4,
                                        n_peaks=2)
        csv = export.export_peaks_csv(pk, tmp_path / "peaks.csv")
        import pandas as pd
        df = pd.read_csv(csv)
        assert set(df.columns) == {'peak_rank', 'k_x', 'k_y', 'frequency_THz',
                                   'intensity', 'linewidth_THz_rms'}
        assert len(df) == 2 * 16
        np.testing.assert_allclose(
            df[df.peak_rank == 0].frequency_THz.to_numpy(),
            pk.freq_surfaces[0].ravel(), atol=1e-6)

    def test_ised_dump_export(self, loaded, tmp_path):
        loaded.compute_kpath_sed("x", n_k=12, bz_coverage=0.5)
        loaded.select_nearest(0.6, 4.0)
        src = loaded.reconstruct_ised("x", char_len=2.5, n_k=8, n_frames=3,
                                      out_dir=tmp_path / "i")
        dest = export.export_ised_dump(src, tmp_path / "out" / "motion.dump",
                                       {'k': 0.6, 'w': 4.0})
        assert dest.exists()
        assert dest.with_suffix('.info.txt').exists()

    def test_figure_export_aspect_ratio(self, tmp_path):
        """Saved-image aspect ratio (reference psa_gui.py:2894-2977): the
        figure is resized for the save and restored afterwards."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        from PIL import Image
        fig, ax = plt.subplots(figsize=(6, 6))
        ax.plot([0, 1], [0, 1])
        ax.axis('off')
        p = tmp_path / "wide.png"
        export.export_figure(fig, p, dpi=50, aspect_ratio='2:1')
        with Image.open(p) as im:
            w, h = im.size
        # bbox_inches='tight' trims margins, so compare loosely
        assert w / h > 1.5
        assert tuple(fig.get_size_inches()) == (6, 6)   # restored
        for spec, want in (('16:9', 16 / 9), ('4/3', 4 / 3), (2.5, 2.5),
                           ('', None), ('auto', None), (None, None)):
            assert export.parse_aspect_ratio(spec) == pytest.approx(want) \
                if want is not None else export.parse_aspect_ratio(spec) is None
        for bad in ('0:1', '-2', 'x:y', 'nan'):
            with pytest.raises(ValueError):
                export.parse_aspect_ratio(bad)
        plt.close(fig)

    def test_figure_export_format_guard(self, tmp_path):
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt
        fig = plt.figure()
        with pytest.raises(ValueError, match="Unsupported image format"):
            export.export_figure(fig, tmp_path / "x.bmp")
        out = export.export_figure(fig, tmp_path / "x.png")
        assert out.exists()
        plt.close(fig)


def test_apply_scale_modes():
    x = np.array([0.0, 1.0, 100.0])
    np.testing.assert_allclose(apply_scale(x, 'linear'), x)
    np.testing.assert_allclose(apply_scale(x, 'sqrt'), np.sqrt(x))
    np.testing.assert_allclose(apply_scale(x, 'dsqrt'), np.sqrt(np.sqrt(x)))
    assert apply_scale(x, 'log')[0] == np.log10(1e-12)


def test_gui_app_importable():
    """The Tk view must import headless (construction needs a display)."""
    import psa_tpu.gui.app  # noqa: F401
    import psa_tpu.gui.widgets  # noqa: F401


class TestReducedKGrid:
    """The controller's default (reduced) k-grid path must produce the same
    browse state as the full-transfer path."""

    def test_reduced_equals_full(self, loaded):
        ctrl = loaded
        kg_red = ctrl.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 4,
                                        max_freq=15.0, chiral=True,
                                        engine='direct', reduced=True)
        red = (kg_red.freqs.copy(), kg_red.intensity.copy(), kg_red.phase.copy())
        kg_full = ctrl.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 5, 4,
                                         max_freq=15.0, chiral=True,
                                         engine='direct', reduced=False)
        np.testing.assert_allclose(red[0], kg_full.freqs)
        np.testing.assert_allclose(red[1], kg_full.intensity, rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(red[2], kg_full.phase, rtol=0, atol=1e-5)
        assert not kg_red.sed.is_complex      # complex Phi never fetched
        # slicing + vrange still work on the reduced state
        assert kg_red.slice_at(0).shape == (4, 5)
        lo, hi = kg_red.global_vrange()
        assert lo <= hi


def test_incoherent_kgrid_full_path_intensity(loaded):
    """Non-reduced incoherent grids must pass through .sed (already an
    intensity), not re-square it through .intensity."""
    kg = loaded.compute_kgrid_sed('xy', (-1, 1), (-1, 1), 4, 3,
                                  basis_atom_types=[1],
                                  summation_mode='incoherent',
                                  engine='direct', reduced=False)
    assert kg.intensity.ndim == 2 and kg.intensity.shape[1] == 12
    assert kg.slice_at(0).shape == (3, 4)


class TestViewCallbackWiring:
    """Static audit of the Tk view: every widget callback, slider command,
    and event binding in gui/app.py must name a method that actually exists
    on PSAMainWindow (no display needed — the class is inspected, not
    instantiated)."""

    def test_all_command_targets_exist(self):
        import inspect
        import re
        from psa_tpu.gui import app
        src = inspect.getsource(app)
        targets = set(re.findall(r"command=self\.(\w+)", src))
        targets |= set(re.findall(r"\.bind\([^)]*self\.(\w+)", src))
        targets |= set(re.findall(r"mpl_connect\([^)]*self\.(\w+)", src))
        targets |= set(re.findall(r"\.after\(\s*\d+\s*,\s*self\.(\w+)", src))
        targets |= set(re.findall(r"protocol\([^)]*self\.(\w+)", src))
        assert targets, "no callbacks found — the audit regexes went stale"
        missing = [t for t in sorted(targets)
                   if not callable(getattr(app.PSAMainWindow, t, None))]
        assert not missing, f"dangling GUI callbacks: {missing}"

    def test_callback_signatures(self):
        """Every wired callback must be CALLABLE with the arguments Tk will
        pass: command=/after → no args; bind/mpl_connect → one event arg
        (round-5 VERDICT item 8 — signature audit in lieu of an xvfb run)."""
        import inspect
        import re
        from psa_tpu.gui import app
        src = inspect.getsource(app)
        # command= passes 0 args from Button/Checkbutton but 1 (the value)
        # from Scale — accept either arity for that group
        cmd = (set(re.findall(r"command=self\.(\w+)", src))
               | set(re.findall(r"\.after\(\s*\d+\s*,\s*self\.(\w+)", src))
               | set(re.findall(r"protocol\([^)]*self\.(\w+)", src)))
        one_arg = (set(re.findall(r"\.bind\([^)]*self\.(\w+)", src))
                   | set(re.findall(r"mpl_connect\([^)]*self\.(\w+)", src)))

        def accepts(name, n_args):
            fn = getattr(app.PSAMainWindow, name)
            sig = inspect.signature(fn)
            try:       # bound call: drop self, pass n_args positionals
                sig.bind(None, *(object(),) * n_args)
                return True
            except TypeError:
                return False

        bad = [t for t in sorted(cmd)
               if not (accepts(t, 0) or accepts(t, 1))]
        bad += [f"{t}(event)" for t in sorted(one_arg) if not accepts(t, 1)]
        assert not bad, f"callback signature mismatches: {bad}"

    def test_controller_calls_resolve(self):
        """Every ``self.controller.<method>(...)`` call site in the view
        must name a real AnalysisController attribute, and method calls
        must bind their literal argument counts (static execution audit)."""
        import inspect
        import re
        from psa_tpu.gui import app
        src = inspect.getsource(app)
        names = set(re.findall(r"self\.controller\.(\w+)", src))
        assert names, "no controller references found — regex went stale"
        missing = [n for n in sorted(names)
                   if not hasattr(AnalysisController, n)
                   and n not in AnalysisController.__init__.__code__.co_names
                   and n not in ('trajectory', 'calculator', 'sed_result',
                                 'kpath_mags', 'kgrid', 'kgrid_peaks', 'dsf',
                                 'liquid', 'last_compute', 'last_grid_kind',
                                 'selected_point', 'ised_dump_path',
                                 'temp_dirs', 'readback_dtype')]
        assert not missing, f"view references unknown controller API: {missing}"


def test_peaks_chiral_phase_surface(loaded):
    pk = loaded.compute_kgrid_peaks('xy', (-1, 1), (-1, 1), 4, 4,
                                    chiral=True, chiral_axis='x')
    assert pk.phase_surfaces is not None
    assert pk.phase_surfaces.shape == (1, 4, 4)
    assert pk.surface(0, 'phase').shape == (4, 4)
    assert np.all(np.abs(pk.phase_surfaces) <= np.pi / 2 + 1e-6)
    pk2 = loaded.compute_kgrid_peaks('xy', (-1, 1), (-1, 1), 4, 4)
    assert pk2.phase_surfaces is None
    import pytest as _pytest
    with _pytest.raises(ValueError, match="phase"):
        pk2.surface(0, 'phase')


def test_full_kpath_sed_for_export(loaded):
    """.npy export keeps the historical complex layout: the reduced display
    path recomputes the full spectrum on demand (code-review r3)."""
    sed = loaded.compute_kpath_sed("x", n_k=10, bz_coverage=0.5, chiral=True)
    assert not sed.is_complex
    full = loaded.full_kpath_sed()
    assert full.is_complex and full.sed.shape == (64, 10, 3)
    assert full.phase is not None
    # display state untouched
    assert loaded.sed_result is sed
    # the reduced planes equal the full spectrum's reduction
    mask = full.freqs >= 0
    np.testing.assert_allclose(sed.sed, full.intensity[mask],
                               rtol=1e-5, atol=1e-8)
    # non-reduced flow passes through without recompute
    sed2 = loaded.compute_kpath_sed("x", n_k=10, bz_coverage=0.5,
                                    reduced=False)
    assert loaded.full_kpath_sed() is sed2


class TestWelchKPath:
    def test_welch_kpath_and_full_export_recompute(self, loaded):
        sed = loaded.compute_kpath_sed('[1,0,0]', n_k=6, bz_coverage=0.5,
                                       welch_segments=4)
        assert not sed.is_complex
        assert sed.sed.shape[0] == 64 // 4
        # .npy export that needs the complex spectrum recomputes the full FFT
        full = loaded.full_kpath_sed()
        assert full.is_complex
        assert full.sed.shape[0] == 64

    def test_welch_chiral_rejected(self, loaded):
        with pytest.raises(ValueError, match="Welch"):
            loaded.compute_kpath_sed('[1,0,0]', n_k=6, bz_coverage=0.5,
                                     welch_segments=4, chiral=True)


class TestLTKPath:
    def test_lt_planes_sum_to_total(self, loaded):
        tot = loaded.compute_kpath_sed('x', n_k=6, bz_coverage=0.5)
        il = loaded.compute_kpath_sed('x', n_k=6, bz_coverage=0.5,
                                      polarization='longitudinal')
        it = loaded.compute_kpath_sed('x', n_k=6, bz_coverage=0.5,
                                      polarization='transverse')
        assert not il.is_complex and not it.is_complex
        np.testing.assert_allclose(il.sed + it.sed, tot.sed,
                                   rtol=1e-4, atol=1e-7)
        # the chain moves along x only: k ∥ x puts everything in I_L
        assert il.sed.sum() > 1e6 * max(it.sed.sum(), 1e-30)
        # export that needs Φ_α recomputes the full spectrum
        assert loaded.full_kpath_sed().is_complex

    def test_lt_rejects_chiral_welch_and_bad_value(self, loaded):
        with pytest.raises(ValueError, match="Chiral"):
            loaded.compute_kpath_sed('x', n_k=6, bz_coverage=0.5,
                                     polarization='longitudinal', chiral=True)
        with pytest.raises(ValueError, match="Welch"):
            loaded.compute_kpath_sed('x', n_k=6, bz_coverage=0.5,
                                     polarization='transverse',
                                     welch_segments=4)
        with pytest.raises(ValueError, match="polarization"):
            loaded.compute_kpath_sed('x', n_k=6, bz_coverage=0.5,
                                     polarization='LA')


class TestKPathDSF:
    """GUI DSF view: instantaneous-phase map over a snapped k-path."""

    def test_shapes_and_state_untouched(self, loaded):
        k, f, plane = loaded.compute_kpath_dsf('x', n_k=16, bz_coverage=0.5,
                                               max_freq=8.0,
                                               observable='longitudinal')
        assert plane.shape == (len(f), len(k))
        assert plane.dtype == np.float32
        assert len(k) >= 2 and np.all(np.diff(k) > 0)
        assert np.all(f >= 0) and np.all(f <= 8.0)
        # the DSF view must not clobber the SED state iSED relies on
        assert loaded.sed_result is None

    def test_matches_direct_calculate_dsf(self, loaded):
        from psa_tpu.ops.instantaneous import nearest_commensurate
        k, f, plane = loaded.compute_kpath_dsf('x', n_k=12, bz_coverage=0.5,
                                               observable='total')
        calc = loaded.calculator
        _, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=12)
        k_vecs = nearest_commensurate(k_vecs, calc.traj.box_lengths)
        _, first = np.unique(np.round(k_vecs, 7), axis=0, return_index=True)
        k_vecs = k_vecs[np.sort(first)]
        f2, s, _, _ = calc.calculate_dsf(k_vecs)
        np.testing.assert_allclose(plane, s, rtol=1e-6)
        np.testing.assert_allclose(f, f2, rtol=1e-6)

    def test_self_observable_matches_calculate_dsf_self(self, loaded):
        from psa_tpu.ops.instantaneous import commensurate_kpath
        k, f, plane = loaded.compute_kpath_dsf('x', n_k=12, bz_coverage=0.5,
                                               observable='self')
        calc = loaded.calculator
        _, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=12)
        k_vecs = commensurate_kpath(k_vecs, calc.traj.box_matrix)
        f2, s_s = calc.calculate_dsf_self(k_vecs)
        np.testing.assert_allclose(plane, s_s, rtol=1e-6)
        np.testing.assert_allclose(f, f2, rtol=1e-6)
        assert loaded.dsf.observable == 'self'

    def test_rejects_bad_observable_and_degenerate_path(self, loaded):
        with pytest.raises(ValueError, match="observable"):
            loaded.compute_kpath_dsf('x', n_k=8, bz_coverage=0.5,
                                     observable='density')
        with pytest.raises(ValueError, match="commensurate"):
            # a 2-point path over a tiny k range snaps to a single point
            loaded.compute_kpath_dsf('x', n_k=2, bz_coverage=0.01)


def test_dsf_csv_export_and_recency(loaded, tmp_path):
    """DSF CSV export carries the plane wide-format; the last_compute
    marker lets the save menu prefer the most recent result."""
    loaded.compute_kpath_sed('x', n_k=8, bz_coverage=0.5)
    assert loaded.last_compute == 'kpath'
    k, f, plane = loaded.compute_kpath_dsf('x', n_k=12, bz_coverage=0.5,
                                           observable='transverse')
    assert loaded.last_compute == 'dsf'
    out = tmp_path / "dsf.csv"
    export.export_dsf_csv(loaded.dsf, out)
    lines = out.read_text().splitlines()
    assert lines[0].startswith("# observable=transverse direction=x")
    data = np.loadtxt(out.as_posix(), delimiter=',', skiprows=2)
    assert data.shape == (len(f), len(k) + 1)
    np.testing.assert_allclose(data[:, 1:], plane, rtol=1e-5)
    # a later grid compute takes back the preference
    loaded.compute_kgrid_sed('xy', (-0.5, 0.5), (-0.5, 0.5), 4, 4,
                             max_freq=8.0)
    assert loaded.last_compute == 'browse'


def test_dsf_csv_keeps_columns_on_magnitude_collision(tmp_path):
    """Snapped k-points whose |k| collide at 1e-4 resolution must not
    overwrite each other's CSV column (the index disambiguates)."""
    from psa_tpu.gui.controller import DSFState
    freqs = np.linspace(0, 5, 4)
    plane = np.arange(12, dtype=np.float32).reshape(4, 3)
    dsf = DSFState(k_mags=np.array([0.12345, 0.123452, 0.2]), freqs=freqs,
                   plane=plane, observable='total', direction_text='x')
    out = tmp_path / "collide.csv"
    export.export_dsf_csv(dsf, out)
    data = np.loadtxt(out.as_posix(), delimiter=',', skiprows=2)
    assert data.shape == (4, 4)           # freq + one column per k-point
    np.testing.assert_allclose(data[:, 1:], plane, rtol=1e-5)


class TestNPTKPath:
    """GUI surface of the NPT (time-dependent cell) family: the controller
    sweeps FRACTIONAL Miller space through calculate_npt_browse and exports
    recompute via calculate_npt (beyond the reference, whose GUI is
    fixed-cell only — psa_gui.py:923-1013)."""

    @pytest.fixture
    def npt_loaded(self, tmp_path):
        """Controller with a breathing-cell chain loaded from an NPT dump
        (per-frame box bounds → Trajectory.box_matrices via the loader)."""
        n_at, n_fr, a0 = 12, 48, 2.5
        L0 = n_at * a0
        rng = np.random.default_rng(11)
        lam = 1.0 + 0.03 * np.sin(np.linspace(0, 2 * np.pi, n_fr))
        x_frac = (np.arange(n_at) + 0.5) / n_at
        tt = np.arange(n_fr) * 0.02
        ph = 2 * np.pi * (4 * x_frac[None, :] - 3.0 * tt[:, None])
        s = x_frac[None, :] + (0.02 / L0) * np.sin(ph)
        pos_x = (lam[:, None] * L0) * s
        vel_x = (lam[:, None] * 0.02 * (-6 * np.pi) * np.cos(ph)
                 + rng.normal(0, 0.05, (n_fr, n_at)))
        dump = tmp_path / "npt_chain.dump"
        with open(dump, "w") as f:
            for t in range(n_fr):
                f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n"
                        f"{n_at}\n")
                f.write("ITEM: BOX BOUNDS pp pp pp\n")
                f.write(f"0.0 {lam[t] * L0:.8f}\n0.0 10.0\n0.0 10.0\n")
                f.write("ITEM: ATOMS id type x y z vx vy vz\n")
                for a_ in range(n_at):
                    f.write(f"{a_ + 1} 1 {pos_x[t, a_]:.8f} 1.0 1.0 "
                            f"{vel_x[t, a_]:.8f} 0.0 0.0\n")
        ctrl = AnalysisController()
        ctrl.load_trajectory(str(dump), dt=0.02, file_format='lammps',
                             nx=n_at, ny=1, nz=1)
        assert ctrl.trajectory.box_matrices is not None
        return ctrl

    @staticmethod
    def _oracle_intensity(traj, m):
        h = traj.box_matrices.astype(np.float64)
        s = np.einsum('tij,taj->tai', np.linalg.inv(h),
                      traj.positions.astype(np.float64))
        phase = np.exp(2j * np.pi * (m @ s.mean(axis=0).T))
        proj = np.einsum('tac,ka->tkc',
                         traj.velocities.astype(np.float64), phase)
        spec = np.fft.fft(proj, axis=0) / traj.n_frames
        return np.sum(np.abs(spec) ** 2, axis=-1)

    def test_reduced_matches_oracle(self, npt_loaded):
        sed = npt_loaded.compute_npt_sed('x', n_k=6, max_order=6.0)
        assert not sed.is_complex
        m = np.array([1, 0, 0], float)[None] \
            * np.linspace(1.0, 6.0, 6)[:, None]
        want = self._oracle_intensity(npt_loaded.trajectory, m)
        mask = np.fft.fftfreq(48, d=0.02) >= 0
        np.testing.assert_allclose(sed.sed, want[mask], rtol=2e-5,
                                   atol=1e-6 * want.max())
        # physical axes: mean-cell Cartesian magnitudes, increasing
        assert np.all(np.diff(sed.k_points) > 0)

    def test_click_and_plot_flow(self, npt_loaded):
        npt_loaded.compute_npt_sed('x', n_k=6, max_order=6.0)
        k, f, c = npt_loaded.kpath_plot_arrays(scale='dsqrt')
        assert c.shape == (len(f), len(k))
        ksel, wsel = npt_loaded.select_nearest(float(k[2]), 3.0)
        assert npt_loaded.selected_point == (ksel, wsel)
        # the ridden commensurate phonon (m=4, nu=3 THz) peaks where built
        inten = npt_loaded.sed_result.sed
        nu_peak = f[np.argmax(inten[:, 3])]
        assert abs(nu_peak - 3.0) < 0.6

    def test_full_export_recompute(self, npt_loaded):
        sed = npt_loaded.compute_npt_sed('x', n_k=5, max_order=5.0)
        full = npt_loaded.full_kpath_sed()
        assert full.is_complex
        mask = full.freqs >= 0
        np.testing.assert_allclose(sed.sed, full.intensity[mask],
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_allclose(full.k_vectors,
                                   np.asarray(sed.k_vectors), atol=0)

    def test_requires_npt_cells(self, loaded):
        with pytest.raises(RuntimeError, match="NPT"):
            loaded.compute_npt_sed('x', n_k=4)

    def test_chiral_and_welch_guards(self, npt_loaded):
        with pytest.raises(ValueError, match="Welch"):
            npt_loaded.compute_npt_sed('x', n_k=4, chiral=True,
                                       welch_segments=4)
        sed = npt_loaded.compute_npt_sed('x', n_k=4, max_order=4.0,
                                         welch_segments=4)
        assert sed.sed.shape[0] == (48 // 4) // 2   # ω ≥ 0 of 12 Welch bins

    # -- NPT grids (fractional Miller plane) --------------------------------

    def test_npt_grid_browse_matches_oracle(self, npt_loaded):
        kg = npt_loaded.compute_kgrid_sed(
            'xy', (1.0, 4.0), (0.0, 1.0), 4, 3, npt=True)
        assert kg.labels == ('m_x', 'm_y')
        m = np.zeros((12, 3))
        m[:, 0] = np.repeat(np.linspace(1.0, 4.0, 4), 3)
        m[:, 1] = np.tile(np.linspace(0.0, 1.0, 3), 4)
        want = self._oracle_intensity(npt_loaded.trajectory, m)
        mask = np.fft.fftfreq(48, d=0.02) >= 0
        np.testing.assert_allclose(kg.intensity, want[mask], rtol=2e-5,
                                   atol=1e-6 * want.max())
        assert kg.slice_at(1).shape == (3, 4)   # (n_ky, n_kx) plot view

    def test_npt_grid_peaks_surface(self, npt_loaded):
        kg = npt_loaded.compute_kgrid_sed(
            'xy', (1.0, 4.0), (0.0, 1.0), 4, 3, npt=True)
        pk = npt_loaded.compute_kgrid_peaks(
            'xy', (1.0, 4.0), (0.0, 1.0), 4, 3, npt=True)
        assert pk.labels == ('m_x', 'm_y')
        expect = kg.freqs[np.argmax(kg.intensity, axis=0)].reshape(4, 3)
        np.testing.assert_allclose(pk.freq_surfaces[0], expect, atol=1e-6)

    def test_npt_grid_guards(self, npt_loaded, loaded):
        with pytest.raises(RuntimeError, match="NPT"):
            loaded.compute_kgrid_sed('xy', (0, 1), (0, 1), 2, 2, npt=True)
        with pytest.raises(ValueError, match="direct engine"):
            npt_loaded.compute_kgrid_sed('xy', (0, 1), (0, 1), 2, 2,
                                         npt=True, engine='gridded')
        with pytest.raises(ValueError, match="total"):
            npt_loaded.compute_kgrid_sed('xy', (0, 1), (0, 1), 2, 2,
                                         npt=True,
                                         polarization='longitudinal')
        with pytest.raises(ValueError, match="reduced"):
            npt_loaded.compute_kgrid_sed('xy', (0, 1), (0, 1), 2, 2,
                                         npt=True, reduced=False)
