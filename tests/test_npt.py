"""NPT (time-dependent cell) SED: fractional-anchor engine + loader plumbing.

The reference is fixed-cell only (reference sed_calculator.py:30-56); this
family is an extension.  Contract:

* `calculate_npt` == f64 NumPy NPT oracle (exp(2πi m·s̄), s = h(t)⁻¹ r)
  to 1e-6 of the oracle max.
* With a constant per-frame cell it degenerates to `calculate` at
  k = B₀·m (same phases through the same kernels).
* Breathing-box physics: on a drifting cell, the fractional anchor keeps a
  commensurate phonon's projection clean where the frame-0 fixed-cell
  mapping leaks.
* Loaders populate `Trajectory.box_matrices` for NPT dumps, and the .npy
  sidecar cache round-trips it.
"""
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays


def _npt_traj(lam, n_cells=16, a=2.5, n_frames=128, dt_ps=0.01,
              mode_m=5, nu_thz=4.0, amp=0.02, seed=7, vel_noise=0.0):
    """1D chain in a cell scaled by lam(t) (length n_frames array); a
    commensurate phonon rides in FRACTIONAL space at mode ``mode_m`` and
    frequency ``nu_thz``."""
    rng = np.random.default_rng(seed)
    n_at, L0 = n_cells, n_cells * a
    x_frac = (np.arange(n_at) + 0.5) / n_cells                  # (N,)
    t = np.arange(n_frames) * dt_ps
    phase = 2 * np.pi * (mode_m * x_frac[None, :] - nu_thz * t[:, None])
    u_frac = (amp / L0) * np.sin(phase)                         # (T, N)
    s = x_frac[None, :] + u_frac
    lam = np.asarray(lam, dtype=np.float64)
    h0 = np.diag([L0, 10.0, 10.0])
    boxes = lam[:, None, None] * h0[None]                       # (T, 3, 3)
    pos = np.zeros((n_frames, n_at, 3), dtype=np.float32)
    pos[:, :, 0] = (lam[:, None] * L0) * s
    # velocities: d/dt of the co-moving phonon (the breathing term lam' r
    # is physical too but omitted so the spectrum has ONE line at nu)
    v = np.zeros_like(pos)
    v[:, :, 0] = (lam[:, None] * amp * (-2 * np.pi * nu_thz)
                  * np.cos(phase)).astype(np.float32)
    if vel_noise:
        v += rng.normal(0, vel_noise, v.shape).astype(np.float32)
    box0 = boxes[0].astype(np.float32)
    lengths, tilts = make_box_arrays(box0)
    return Trajectory(
        positions=pos, velocities=v,
        types=np.ones(n_at, dtype=np.int32),
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box0, box_lengths=lengths, box_tilts=tilts,
        dt_ps=dt_ps, box_matrices=boxes.astype(np.float32))


def _npt_oracle(traj, miller):
    """f64 NumPy oracle of the NPT formula: Φ = FFT_t[Σ_a v e^{2πi m·s̄}]/n_t."""
    h = traj.box_matrices.astype(np.float64)
    hinv = np.linalg.inv(h)
    s = np.einsum('tij,taj->tai', hinv, traj.positions.astype(np.float64))
    sbar = s.mean(axis=0)
    ph = np.exp(2j * np.pi * (miller.astype(np.float64) @ sbar.T))  # (K, N)
    proj = np.einsum('tac,ka->tkc', traj.velocities.astype(np.float64), ph)
    return np.fft.fft(proj, axis=0) / traj.n_frames


class TestValidation:
    def test_requires_box_matrices(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        with pytest.raises(ValueError, match="box_matrices"):
            calc.calculate_npt(np.ones((3, 3)))

    def test_rejects_displacement_mode(self):
        traj = _npt_traj(np.ones(16), n_frames=16)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1,
                             use_displacements=True)
        with pytest.raises(ValueError, match="velocity"):
            calc.calculate_npt(np.ones((3, 3)))

    def test_rejects_bad_miller_shape(self):
        traj = _npt_traj(np.ones(16), n_frames=16)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        with pytest.raises(ValueError, match="n_k, 3"):
            calc.calculate_npt(np.ones((3, 2)))

    def test_trajectory_validates_box_matrices_shape(self, small_trajectory):
        with pytest.raises(ValueError, match="box_matrices"):
            Trajectory(
                positions=small_trajectory.positions,
                velocities=small_trajectory.velocities,
                types=small_trajectory.types,
                timesteps=small_trajectory.timesteps,
                box_matrix=small_trajectory.box_matrix,
                box_lengths=small_trajectory.box_lengths,
                box_tilts=small_trajectory.box_tilts,
                dt_ps=small_trajectory.dt_ps,
                box_matrices=np.zeros((3, 3, 3), dtype=np.float32))


class TestOracle:
    def test_matches_f64_npt_oracle(self):
        lam = 1.0 + 0.04 * np.sin(np.linspace(0, 3 * np.pi, 96))
        traj = _npt_traj(lam, n_frames=96, vel_noise=0.3)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        m = np.zeros((8, 3)); m[:, 0] = np.arange(1, 9)
        sed = calc.calculate_npt(m)
        oracle = _npt_oracle(traj, m)
        scale = np.abs(oracle).max()
        err = np.abs(sed.sed - oracle).max() / scale
        assert err < 1e-6, err

    def test_constant_cell_degenerates_to_calculate(self):
        traj = _npt_traj(np.ones(64), n_frames=64, vel_noise=0.2)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        m = np.zeros((6, 3)); m[:, 0] = np.arange(1, 7)
        sed_npt = calc.calculate_npt(m)
        L0 = 16 * 2.5
        kv = (2 * np.pi / L0) * m.astype(np.float32)
        sed_fix = calc.calculate(np.linalg.norm(kv, axis=1), kv)
        np.testing.assert_allclose(sed_npt.intensity, sed_fix.intensity,
                                   rtol=2e-5, atol=1e-10)
        # physical k axes from the (constant) mean cell
        np.testing.assert_allclose(sed_npt.k_vectors, kv, rtol=1e-6)

    def test_cache_dir_keys_anchor_separately(self, tmp_path):
        """An NPT run and a fixed-cell run over numerically identical
        k-vector arrays must not share shard-cache entries."""
        traj = _npt_traj(np.ones(32), n_frames=32, vel_noise=0.2)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        m = np.zeros((4, 3)); m[:, 0] = np.arange(1, 5)
        k_eff = (2 * np.pi * m).astype(np.float32)
        sed_fix = calc.calculate(np.linalg.norm(k_eff, axis=1), k_eff,
                                 cache_dir=tmp_path)
        sed_npt = calc.calculate_npt(m, cache_dir=tmp_path)
        assert not np.allclose(sed_npt.intensity, sed_fix.intensity)
        oracle = _npt_oracle(traj, m)
        err = (np.abs(sed_npt.sed - oracle).max() / np.abs(oracle).max())
        # sanity only (stale-cache results would be off by O(1)); the tight
        # 1e-6 parity bar lives in test_matches_f64_npt_oracle
        assert err < 5e-6, err


class TestBreathingBoxPhysics:
    def test_drifting_cell_keeps_phonon_clean(self):
        """Linear 10% cell drift: the mean cell differs from frame 0, so
        the fixed-cell frame-0 k-mapping DEPHASES a commensurate phonon
        across atoms (the projected amplitude at the target mode drops —
        energy leaks into neighboring k columns), while the fractional
        anchor resolves it exactly."""
        n_frames, nu, mode_m = 128, 4.0, 7
        lam = 1.0 + 0.10 * np.linspace(0.0, 1.0, n_frames)
        traj = _npt_traj(lam, n_frames=n_frames, nu_thz=nu, mode_m=mode_m)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        m = np.zeros((8, 3)); m[:, 0] = np.arange(1, 9)
        sed = calc.calculate_npt(m)
        inten = sed.intensity
        pos_rows = sed.freqs >= 0
        # peak of the target mode sits on the phonon frequency
        i_col = mode_m - 1
        peak_row = np.argmax(inten[pos_rows][:, i_col])
        peak_freq = sed.freqs[pos_rows][peak_row]
        df = sed.freqs[1] - sed.freqs[0]
        assert abs(peak_freq - nu) <= df + 1e-9
        # fixed-cell frame-0 mapping of the SAME trajectory: the mean cell
        # is 5% larger than frame 0, so 2πm/L0 hits the mode incommensurate
        # and its captured peak intensity drops well below the NPT path's
        L0 = 16 * 2.5
        kv = (2 * np.pi / L0) * m.astype(np.float32)   # frame-0 cell mapping
        sed_fix = calc.calculate(np.linalg.norm(kv, axis=1), kv)
        peak_npt = inten[pos_rows][:, i_col].max()
        peak_fix = sed_fix.intensity[pos_rows][:, i_col].max()
        assert peak_npt > 1.2 * peak_fix, (peak_npt, peak_fix)
        # and the NPT mode projection is clean: neighbors carry ~nothing
        neighbor = max(inten[pos_rows][:, i_col - 1].max(),
                       inten[pos_rows][:, i_col + 1].max())
        assert neighbor < 0.05 * peak_npt


class TestLoaderPlumbing:
    def _write_npt_dump(self, path, n_frames=4, n_at=6):
        rng = np.random.default_rng(2)
        lines = []
        for t in range(n_frames):
            L = 10.0 * (1.0 + 0.02 * t)
            lines += ["ITEM: TIMESTEP", str(t),
                      "ITEM: NUMBER OF ATOMS", str(n_at),
                      "ITEM: BOX BOUNDS pp pp pp",
                      f"0.0 {L}", "0.0 10.0", "0.0 10.0",
                      "ITEM: ATOMS id type x y z vx vy vz"]
            for i in range(n_at):
                x = rng.uniform(0, 9, 3)
                v = rng.normal(0, 1, 3)
                lines.append(f"{i+1} 1 {x[0]:.4f} {x[1]:.4f} {x[2]:.4f} "
                             f"{v[0]:.4f} {v[1]:.4f} {v[2]:.4f}")
        path.write_text("\n".join(lines) + "\n")

    def test_lammps_npt_dump_fills_box_matrices(self, tmp_path):
        from psa_tpu.io.loader import TrajectoryLoader
        dump = tmp_path / "npt.dump"
        self._write_npt_dump(dump)
        traj = TrajectoryLoader(str(dump), dt=0.01).load()
        assert traj.box_matrices is not None
        assert traj.box_matrices.shape == (4, 3, 3)
        assert traj.box_matrices[3, 0, 0] == pytest.approx(10.0 * 1.06)
        np.testing.assert_allclose(traj.box_matrix, traj.box_matrices[0])
        # second load comes from the .npy sidecar cache — field survives
        traj2 = TrajectoryLoader(str(dump), dt=0.01).load()
        np.testing.assert_allclose(traj2.box_matrices, traj.box_matrices)

    def test_fixed_cell_dump_leaves_none(self, tmp_path):
        from psa_tpu.io.loader import TrajectoryLoader
        dump = tmp_path / "nvt.dump"
        rng = np.random.default_rng(3)
        lines = []
        for t in range(3):
            lines += ["ITEM: TIMESTEP", str(t),
                      "ITEM: NUMBER OF ATOMS", "4",
                      "ITEM: BOX BOUNDS pp pp pp",
                      "0.0 10.0", "0.0 10.0", "0.0 10.0",
                      "ITEM: ATOMS id type x y z"]
            for i in range(4):
                x = rng.uniform(0, 9, 3)
                lines.append(f"{i+1} 1 {x[0]:.4f} {x[1]:.4f} {x[2]:.4f}")
        dump.write_text("\n".join(lines) + "\n")
        traj = TrajectoryLoader(str(dump), dt=0.01).load()
        assert traj.box_matrices is None


class TestNPTSweeps:
    """Round-5 VERDICT item 9: the browse/peaks sweep forms and the mesh
    share the fractional anchor with calculate_npt."""

    @pytest.fixture(scope='class')
    def drift(self):
        lam = 1.0 + 0.01 * np.sin(np.linspace(0, 2 * np.pi, 128))
        traj = _npt_traj(lam)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        miller = np.stack([np.arange(1, 8) / 16.0,
                           np.zeros(7), np.zeros(7)], axis=1)
        return traj, calc, miller

    def test_browse_equals_full_reduction(self, drift):
        traj, calc, miller = drift
        sed = calc.calculate_npt(miller)
        freqs, inten, phase, k_cart = calc.calculate_npt_browse(miller)
        assert phase is None
        mask = sed.freqs >= 0
        np.testing.assert_allclose(inten, sed.intensity[mask],
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_array_equal(freqs, sed.freqs[mask])
        np.testing.assert_allclose(k_cart, sed.k_vectors, atol=0)

    def test_browse_matches_oracle_peak(self, drift):
        """The drifting-cell oracle: the browse plane's peak must sit on
        the ridden phonon's (m, ν) for the commensurate mode."""
        traj, calc, miller = drift
        freqs, inten, _, _ = calc.calculate_npt_browse(miller)
        oracle = _npt_oracle(traj, miller)
        mask = np.fft.fftfreq(traj.n_frames, d=traj.dt_ps) >= 0
        want = (np.abs(oracle) ** 2).sum(axis=-1)[mask]
        np.testing.assert_allclose(inten, want,
                                   rtol=2e-5, atol=1e-6 * want.max())
        # mode m=5 (miller row 4) peaks at nu = 4 THz
        k_idx = 4
        nu_peak = freqs[np.argmax(inten[:, k_idx])]
        assert abs(nu_peak - 4.0) < 0.5

    def test_peaks_form(self, drift):
        traj, calc, miller = drift
        out = calc.calculate_npt_peaks(miller, n_peaks=1)
        pf, pi, pw, k_cart = out
        assert pf.shape == (1, len(miller))
        assert k_cart.shape == (len(miller), 3)
        freqs, inten, _, _ = calc.calculate_npt_browse(miller)
        np.testing.assert_allclose(pf[0], freqs[np.argmax(inten, axis=0)],
                                   atol=1e-6)

    @pytest.mark.slow
    def test_sharded_browse_matches_single_chip(self, drift):
        from psa_tpu.parallel import make_mesh
        traj, calc, miller = drift
        freqs1, inten1, _, kc1 = calc.calculate_npt_browse(miller)
        mesh = make_mesh(shape=(2, 2, 2))
        freqs2, inten2, _, kc2 = calc.calculate_npt_browse(miller, mesh=mesh)
        np.testing.assert_array_equal(freqs1, freqs2)
        np.testing.assert_allclose(inten2, inten1, rtol=2e-5,
                                   atol=1e-6 * inten1.max())
        np.testing.assert_allclose(kc1, kc2, atol=0)

    def test_anchor_restored_on_error(self, drift):
        traj, calc, miller = drift
        with pytest.raises(ValueError):
            calc.calculate_npt_browse(miller, engine='bogus')
        assert calc._phase_anchor == 'cartesian'


class TestNPTiSED:
    """iSED with the fractional anchor (npt=True): a mode clicked off an
    NPT dispersion reconstructs its real-space motion from 2π m·s̄."""

    def test_reconstructs_commensurate_mode(self, tmp_path):
        lam = 1.0 + 0.03 * np.sin(np.linspace(0, 2 * np.pi, 96))
        traj = _npt_traj(lam, n_frames=96, vel_noise=0.05)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        # physical target: mean-cell |B̄·m| at the ridden m=5, ν=4 THz
        L_mean = lam.mean() * 16 * 2.5
        k_target = 2 * np.pi * 5 / L_mean
        dump = tmp_path / "ised_npt.dump"
        calc.ised(k_dir_spec=[1, 0, 0], k_target=k_target, w_target=4.0,
                  char_len_k_path=2.5, nk_on_path=8, bz_cov_ised=8.0,
                  rescale_factor='auto', n_recon_frames=32,
                  dump_filepath=str(dump), npt=True)
        assert calc._phase_anchor == 'cartesian'   # restored
        from psa_tpu.io.lammps import read_lammps_dump
        pos, _, _, _, _ = read_lammps_dump(dump, unwrap=False)
        assert pos.shape == (32, 16, 3)
        disp = pos[:, :, 0] - pos[:, :, 0].mean(axis=0, keepdims=True)
        # spatial DFT over the chain: the reconstruction must carry EXACTLY
        # the m=5 spatial frequency (the synthesized phase is 2π·5·s̄)
        spec = np.abs(np.fft.fft(disp[0]))
        assert np.argmax(spec[1:8]) + 1 == 5, spec[:8]
        # temporal: one full period over the synthesized frames
        tspec = np.abs(np.fft.fft(disp[:, 3]))
        assert np.argmax(tspec[1:16]) + 1 == 1, tspec[:6]

    def test_requires_box_matrices(self, small_trajectory, tmp_path):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        with pytest.raises(ValueError, match="box_matrices"):
            calc.ised(k_dir_spec='x', k_target=0.5, w_target=1.0,
                      char_len_k_path=2.5, nk_on_path=4, bz_cov_ised=2.0,
                      dump_filepath=str(tmp_path / "x.dump"), npt=True)

    def test_gui_autodetects_npt_recompute(self, tmp_path, monkeypatch):
        from psa_tpu.gui.controller import AnalysisController
        lam = 1.0 + 0.02 * np.sin(np.linspace(0, 2 * np.pi, 48))
        traj = _npt_traj(lam, n_frames=48, vel_noise=0.1)
        ctrl = AnalysisController()
        ctrl.trajectory = traj
        ctrl.calculator = SEDCalculator(traj, nx=16, ny=1, nz=1)
        ctrl.compute_npt_sed('x', n_k=6, max_order=6.0)
        ctrl.select_nearest(ctrl.sed_result.k_points[4], 4.0)
        seen = {}
        real_ised = ctrl.calculator.ised

        def spy(**kw):
            seen.update(kw)
            return real_ised(**kw)
        monkeypatch.setattr(ctrl.calculator, 'ised', spy)
        ctrl.reconstruct_ised('x', char_len=2.5, n_k=6, bz_coverage=6.0,
                              n_frames=8, out_dir=tmp_path)
        assert seen['npt'] is True                 # followed the NPT compute
        assert (tmp_path / "ised_reconstruction.dump").exists()
        # fixed-cell compute flips it back off
        ctrl.compute_kpath_sed('x', n_k=6, bz_coverage=0.5)
        ctrl.select_nearest(0.3, 2.0)
        ctrl.reconstruct_ised('x', char_len=2.5, n_k=6, bz_coverage=0.5,
                              n_frames=8, out_dir=tmp_path)
        assert seen['npt'] is False


class TestReviewFixes:
    """Round-5 self-review regressions: GUI/CLI Miller consistency, NPT
    chiral export, drift-proof auto-rescale, auto-iSED path widening,
    serialized GUI computes."""

    @pytest.fixture
    def ctrl(self):
        from psa_tpu.gui.controller import AnalysisController
        lam = 1.0 + 0.02 * np.sin(np.linspace(0, 2 * np.pi, 48))
        traj = _npt_traj(lam, n_frames=48, vel_noise=0.1)
        c = AnalysisController()
        c.trajectory = traj
        c.calculator = SEDCalculator(traj, nx=16, ny=1, nz=1)
        return c

    def test_gui_diagonal_direction_stays_commensurate(self, ctrl):
        """'xy' must sweep integer-multiple Miller rows [m,m,0] — the unit
        vector [0.707, ...] would miss every box-commensurate mode."""
        ctrl.compute_npt_sed('xy', n_k=3, max_order=3.0)
        m = ctrl._kpath_recompute['npt_k_miller']
        np.testing.assert_allclose(m, [[1, 1, 0], [2, 2, 0], [3, 3, 0]])

    def test_npt_chiral_survives_export_recompute(self, ctrl):
        sed = ctrl.compute_npt_sed('x', n_k=4, max_order=4.0, chiral=True)
        assert sed.phase is not None
        full = ctrl.full_kpath_sed()
        assert full.is_complex and full.phase is not None
        mask = full.freqs >= 0
        np.testing.assert_allclose(sed.phase, full.phase[mask], atol=1e-5)

    def test_auto_rescale_ignores_cell_drift(self, tmp_path):
        """±3% breathing on a long box: Cartesian drift std is ~100× the
        mode amplitude; 'auto' must scale to the VIBRATION, not the
        drift."""
        lam = 1.0 + 0.03 * np.sin(np.linspace(0, 2 * np.pi, 96))
        traj = _npt_traj(lam, n_cells=32, n_frames=96, vel_noise=0.0)
        calc = SEDCalculator(traj, nx=32, ny=1, nz=1)
        # true vibrational scale: fractional detrended displacement
        h = traj.box_matrices.astype(np.float64)
        s = np.einsum('tij,taj->tai', np.linalg.inv(h),
                      traj.positions.astype(np.float64))
        vib_std = np.std((s - s.mean(axis=0)) @ h.mean(axis=0).T)
        drift_std = np.std(traj.positions
                           - traj.positions.mean(axis=0, keepdims=True))
        assert drift_std > 10 * vib_std      # the trap is real
        L_mean = lam.mean() * 32 * 2.5
        dump = tmp_path / "auto.dump"
        calc.ised(k_dir_spec='x', k_target=2 * np.pi * 5 / L_mean,
                  w_target=4.0, char_len_k_path=2.5, nk_on_path=8,
                  bz_cov_ised=8.0, rescale_factor='auto',
                  n_recon_frames=16, dump_filepath=str(dump), npt=True)
        from psa_tpu.io.lammps import read_lammps_dump
        pos, _, _, _, _ = read_lammps_dump(dump, unwrap=False)
        amp = np.abs(pos - pos.mean(axis=0, keepdims=True)).max()
        assert amp < 10 * vib_std, (amp, vib_std, drift_std)

    def test_auto_ised_widens_miller_path(self, ctrl, tmp_path):
        """Clicking m=5 on an NPT dispersion must reconstruct m=5 even
        with the recon tab's BZ-coverage field left at its 1.0 default."""
        ctrl.compute_npt_sed('x', n_k=8, max_order=8.0)
        ctrl.select_nearest(ctrl.sed_result.k_points[4], 4.0)   # m=5
        ctrl.reconstruct_ised('x', char_len=2.5, n_k=8,
                              bz_coverage=1.0, n_frames=8,
                              out_dir=tmp_path)
        from psa_tpu.io.lammps import read_lammps_dump
        pos, _, _, _, _ = read_lammps_dump(
            tmp_path / "ised_reconstruction.dump", unwrap=False)
        disp = pos[:, :, 0] - pos[:, :, 0].mean(axis=0, keepdims=True)
        spec = np.abs(np.fft.fft(disp[0]))
        assert np.argmax(spec[1:8]) + 1 == 5, spec[:8]

    def test_concurrent_computes_serialize(self, ctrl):
        """The controller lock: an NPT sweep (fractional anchor) racing a
        fixed-cell sweep must produce the same spectra as serial runs."""
        import threading
        kv = (2 * np.pi / (16 * 2.5)) * np.arange(1, 5, dtype=np.float64)
        expect_npt = ctrl.compute_npt_sed('x', n_k=4, max_order=4.0).sed
        expect_fix = ctrl.compute_kpath_sed('x', n_k=8,
                                            bz_coverage=0.5).sed
        results = {}

        def run_npt():
            results['npt'] = ctrl.compute_npt_sed('x', n_k=4,
                                                  max_order=4.0).sed

        def run_fix():
            results['fix'] = ctrl.compute_kpath_sed('x', n_k=8,
                                                    bz_coverage=0.5).sed
        for _ in range(3):
            t1 = threading.Thread(target=run_npt)
            t2 = threading.Thread(target=run_fix)
            t1.start(); t2.start(); t1.join(); t2.join()
            np.testing.assert_allclose(results['npt'], expect_npt,
                                       rtol=1e-6)
            np.testing.assert_allclose(results['fix'], expect_fix,
                                       rtol=1e-6)
