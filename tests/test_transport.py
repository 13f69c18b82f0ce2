"""Phonon lifetimes + kinetic-theory conductivity (ops/transport.py).

Unit tests pin the τ = 1/(2π·FWHM) convention and the κ unit conversion
exactly; the end-to-end oracle runs the full pipeline (damped square
lattice → Lorentzian peaks → band sort → ∇ν → τ → κ) against closed-form
physics: every mode of ``amp_decay_per_ps=γ`` has τ = 1/(2γ) exactly.
"""
import numpy as np
import pytest

from psa_tpu import SEDCalculator
from psa_tpu.models import (make_square_lattice_trajectory,
                            square_lattice_dispersion)
from psa_tpu.ops import dispersion, transport


class TestPhononLifetimes:
    def test_inverse_width_convention(self):
        w = np.array([1.0 / np.pi, 2.0 / np.pi], dtype=np.float32)
        tau = transport.phonon_lifetimes(w)
        np.testing.assert_allclose(tau, [0.5, 0.25], rtol=1e-6)

    def test_resolution_floor_masks_unresolved(self):
        w = np.array([0.05, 0.2, 0.0, -1.0], dtype=np.float32)
        tau = transport.phonon_lifetimes(w, resolution_fwhm_thz=0.1)
        assert np.isnan(tau[0]) and np.isnan(tau[2]) and np.isnan(tau[3])
        np.testing.assert_allclose(tau[1], 1 / (2 * np.pi * 0.2), rtol=1e-6)

    def test_zero_width_nan_without_floor(self):
        tau = transport.phonon_lifetimes(np.zeros(3))
        assert np.all(np.isnan(tau))


class TestKineticKappa:
    def test_unit_conversion_single_mode(self):
        # v = 1 Å/ps = 100 m/s, τ = 1 ps, V = 1000 Å³ = 1e-27 m³:
        # κ_xx = kB · (100 m/s)² · 1e-12 s / 1e-27 m³ = kB · 1e22 / 1000
        one = np.ones((1, 1, 1), dtype=np.float32)
        res = transport.kinetic_kappa(one, 0 * one, one, volume_a3=1000.0)
        np.testing.assert_allclose(res.kappa_xx, 1.380649e-4, rtol=1e-6)
        assert res.kappa_yy == 0.0 and res.kappa_xy == 0.0
        assert res.n_modes_used == 1 and res.n_modes_total == 1

    def test_nan_lifetimes_skipped_and_counted(self):
        vx = np.array([1.0, 2.0])
        tau = np.array([1.0, np.nan])
        res = transport.kinetic_kappa(vx, vx, tau, volume_a3=1.0)
        assert res.n_modes_used == 1 and res.n_modes_total == 2
        np.testing.assert_allclose(
            res.kappa_xx, transport.KB_J_PER_K * 1e22, rtol=1e-6)

    def test_mode_weights(self):
        vx = np.array([1.0])
        res1 = transport.kinetic_kappa(vx, vx, np.ones(1), volume_a3=1.0)
        res2 = transport.kinetic_kappa(vx, vx, np.ones(1), volume_a3=1.0,
                                       mode_weights=np.array([2.0]))
        np.testing.assert_allclose(res2.kappa_xx, 2 * res1.kappa_xx)

    def test_validation(self):
        with pytest.raises(ValueError, match="shape"):
            transport.kinetic_kappa(np.ones(2), np.ones(3), np.ones(2), 1.0)
        with pytest.raises(ValueError, match="volume"):
            transport.kinetic_kappa(np.ones(2), np.ones(2), np.ones(2), 0.0)
        with pytest.raises(ValueError, match="mode_weights"):
            transport.kinetic_kappa(np.ones(2), np.ones(2), np.ones(2), 1.0,
                                    mode_weights=np.ones(3))


class TestThermalConductivityOracle:
    """Damped square lattice: every mode has τ = 1/(2γ) exactly, v_g from
    the analytic surface — κ must match the closed-form sum within the
    peak-bin + fit tolerances."""

    def test_kappa_matches_analytic(self):
        a, nu_max, n_cells = 2.5, 10.0, 8
        n_frames, dt, gamma = 2048, 0.01, 1.0
        traj = make_square_lattice_trajectory(
            n_cells=n_cells, n_frames=n_frames, dt_ps=dt, a=a,
            nu_max_thz=nu_max, seed=7, amp_decay_per_ps=gamma)
        calc = SEDCalculator(traj, nx=n_cells, ny=n_cells, nz=1)
        # grid exactly on allowed modes, EXCLUDING Γ (no mode there)
        dk = 2 * np.pi / (n_cells * a)
        m = n_cells // 2
        _, k_vecs, shape = calc.get_k_grid('xy', (dk, m * dk), (dk, m * dk),
                                           m, m)
        res, bf, vx, vy = calc.calculate_thermal_conductivity(
            k_vecs, shape, n_bands=1, exclusion_bins=12)
        # every sampled mode must be resolved (FWHM = γ/π >> 2·df)
        assert res.n_modes_used == res.n_modes_total == m * m
        # lifetimes: τ = 1/(2γ) within the Lorentzian-fit tolerance
        np.testing.assert_allclose(res.lifetimes_ps,
                                   1.0 / (2 * gamma), rtol=0.08)
        # κ against the same sum built from ANALYTIC ingredients
        kx = np.unique(k_vecs[:, 0].astype(np.float64))
        ky = np.unique(k_vecs[:, 1].astype(np.float64))
        KX, KY = np.meshgrid(kx, ky, indexing='ij')
        analytic = square_lattice_dispersion(KX, KY, a=a, nu_max_thz=nu_max)
        want_vx, want_vy = dispersion.group_velocity_grid(analytic[None],
                                                          kx, ky)
        vol = float(np.abs(np.linalg.det(traj.box_matrix.astype(np.float64))))
        want = transport.kinetic_kappa(
            want_vx, want_vy, np.full_like(want_vx, 1.0 / (2 * gamma)), vol)
        assert want.kappa_xx > 0
        np.testing.assert_allclose(res.kappa_xx, want.kappa_xx, rtol=0.2)
        np.testing.assert_allclose(res.kappa_yy, want.kappa_yy, rtol=0.2)
        # by symmetry of the sampled quadrant, κ_xx ≈ κ_yy
        np.testing.assert_allclose(res.kappa_xx, res.kappa_yy, rtol=0.15)

    def test_mesh_path_matches_single_chip(self):
        """mesh= routes the peak sweep over the (t, a, k) device mesh; the
        transport post-processing must be bit-for-bit the same chain, so κ
        agrees to the sharded-peaks tolerance."""
        from psa_tpu.parallel import make_mesh
        # γ=3/ps: FWHM = γ/π ≈ 0.95 THz clears the 2-bin floor (0.39 THz at
        # 512 frames) so modes actually resolve — κ asserts are non-vacuous
        a, nu_max, n_cells = 2.5, 10.0, 8
        traj = make_square_lattice_trajectory(
            n_cells=n_cells, n_frames=512, dt_ps=0.01, a=a,
            nu_max_thz=nu_max, seed=3, amp_decay_per_ps=3.0)
        calc = SEDCalculator(traj, nx=n_cells, ny=n_cells, nz=1)
        dk = 2 * np.pi / (n_cells * a)
        m = n_cells // 2
        _, k_vecs, shape = calc.get_k_grid('xy', (dk, m * dk), (dk, m * dk),
                                           m, m)
        ref, rf, rvx, rvy = calc.calculate_thermal_conductivity(
            k_vecs, shape, n_bands=1, exclusion_bins=12)
        mesh = make_mesh(shape=(2, 2, 2))
        res, pf, vx, vy = calc.calculate_thermal_conductivity(
            k_vecs, shape, n_bands=1, exclusion_bins=12, mesh=mesh,
            t_superchunk=256)
        np.testing.assert_allclose(pf, rf, atol=1e-5)
        assert ref.n_modes_used > 0          # floor cleared: not vacuous
        assert res.n_modes_used == ref.n_modes_used
        np.testing.assert_allclose(res.kappa_xx, ref.kappa_xx, rtol=1e-3)
        np.testing.assert_allclose(res.kappa_yy, ref.kappa_yy, rtol=1e-3)

    def test_kwarg_validation(self):
        traj = make_square_lattice_trajectory(n_cells=4, n_frames=32,
                                              dt_ps=0.01)
        calc = SEDCalculator(traj, nx=4, ny=4, nz=1)
        _, k_vecs, shape = calc.get_k_grid('xy', (0.1, 1.0), (0.1, 1.0), 3, 3)
        with pytest.raises(ValueError, match="chiral"):
            calc.calculate_thermal_conductivity(k_vecs, shape, chiral=True)
        with pytest.raises(ValueError, match="lorentzian"):
            calc.calculate_thermal_conductivity(k_vecs, shape,
                                                width_method='rms')
