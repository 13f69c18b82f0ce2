"""Longitudinal/transverse SED decomposition (calculate_lt, ops lt_reduce).

The reference exposes only Cartesian polarizations (sed_calculator.py:80-83);
the L/T split is a net-new branch-classification capability.  Oracles:

* injected plane waves — a velocity field polarized along k̂ must land
  entirely in I_L (and one polarized perpendicular entirely in I_T), with the
  spectral peak at the injected frequency;
* exact consistency — I_L + I_T equals the browse intensity, and I_L equals
  |k̂·Φ|² of the float64 reference-formula oracle.
"""
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays
from psa_tpu.ops import spectral

from conftest import reference_sed_oracle


def plane_wave_trajectory(pol, k0, omega_thz, n_frames=64, side=6, dt_ps=0.01,
                          noise=0.0, seed=0):
    """Atoms on a cubic grid; velocities are a monochromatic plane wave
    v_a(t) = pol * cos(k0·r_a − 2π ν t) (+ optional noise)."""
    a0 = 2.0
    grid = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                    axis=-1).reshape(-1, 3).astype(np.float64) * a0
    n_atoms = grid.shape[0]
    t = np.arange(n_frames, dtype=np.float64) * dt_ps
    phase = grid @ np.asarray(k0, dtype=np.float64)         # (N,)
    wave = np.cos(phase[None, :] - 2 * np.pi * omega_thz * t[:, None])  # (T, N)
    vel = wave[:, :, None] * np.asarray(pol, dtype=np.float64)[None, None, :]
    if noise:
        rng = np.random.default_rng(seed)
        vel = vel + noise * rng.standard_normal(vel.shape)
    box = np.diag([side * a0] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(
        positions=np.broadcast_to(grid.astype(np.float32),
                                  (n_frames, n_atoms, 3)).copy(),
        velocities=vel.astype(np.float32),
        types=np.ones(n_atoms, dtype=np.int32),
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)


class TestUnitKVectors:
    def test_normalizes_and_keeps_zero_rows(self):
        kv = np.array([[3.0, 0, 0], [0, 0, 0], [1.0, 1.0, 0]], np.float32)
        ku = spectral.unit_k_vectors(kv)
        np.testing.assert_allclose(ku[0], [1, 0, 0], atol=1e-7)
        np.testing.assert_allclose(ku[1], [0, 0, 0], atol=0)
        np.testing.assert_allclose(np.linalg.norm(ku[2]), 1.0, rtol=1e-6)


class TestPlaneWaveOracle:
    K0 = np.array([2 * np.pi / (6 * 2.0) * 3, 0.0, 0.0])  # along x, in-band
    NU = 12.5   # THz, an exact FFT bin of 64 frames @ 0.01 ps (bin = 1.5625)

    def _lt(self, traj):
        calc = SEDCalculator(traj, nx=6, ny=6, nz=6)
        kv = self.K0[None, :].astype(np.float32)
        return calc.calculate_lt(kv)

    def test_longitudinal_wave_is_pure_L(self):
        traj = plane_wave_trajectory([1.0, 0, 0], self.K0, self.NU)
        freqs, i_l, i_t = self._lt(traj)
        assert i_l.max() > 0
        assert i_t.max() <= 1e-6 * i_l.max()
        nu_peak = freqs[np.argmax(i_l[:, 0])]
        assert abs(nu_peak - self.NU) < 1e-6

    def test_transverse_wave_is_pure_T(self):
        traj = plane_wave_trajectory([0, 1.0, 0], self.K0, self.NU)
        freqs, i_l, i_t = self._lt(traj)
        assert i_t.max() > 0
        assert i_l.max() <= 1e-6 * i_t.max()
        nu_peak = freqs[np.argmax(i_t[:, 0])]
        assert abs(nu_peak - self.NU) < 1e-6

    def test_oblique_polarization_splits_by_projection(self):
        # pol at 60° to k̂: |cos 60°|² = 1/4 of the power is longitudinal
        pol = [np.cos(np.pi / 3), np.sin(np.pi / 3), 0.0]
        traj = plane_wave_trajectory(pol, self.K0, self.NU)
        _, i_l, i_t = self._lt(traj)
        total = i_l.sum() + i_t.sum()
        assert abs(i_l.sum() / total - 0.25) < 1e-4
        assert abs(i_t.sum() / total - 0.75) < 1e-4


class TestConsistency:
    def test_sum_matches_browse_and_oracle(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        kv = np.array([[0.5, 0.2, 0.0], [0.0, 0.9, 0.3], [1.1, 0.0, 0.0]],
                      np.float32)
        freqs, i_l, i_t = calc.calculate_lt(kv)
        freqs_b, inten, _ = calc.calculate_kgrid_browse(kv)
        np.testing.assert_allclose(freqs, freqs_b)
        np.testing.assert_allclose(i_l + i_t, inten, rtol=2e-5, atol=1e-8)

        # I_L against the float64 reference-formula oracle
        phi = reference_sed_oracle(small_trajectory, kv)      # (T, K, 3) c128
        ku = spectral.unit_k_vectors(kv).astype(np.float64)
        phi_l = np.einsum('tkc,kc->tk', phi, ku)
        mask = spectral.fftfreq_thz(small_trajectory.n_frames,
                                    small_trajectory.dt_ps) >= 0
        oracle_l = np.abs(phi_l[mask]) ** 2
        np.testing.assert_allclose(i_l, oracle_l, rtol=2e-4,
                                   atol=1e-6 * oracle_l.max())

    def test_gamma_point_convention(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        kv = np.array([[0.0, 0.0, 0.0], [0.7, 0.0, 0.0]], np.float32)
        _, i_l, i_t = calc.calculate_lt(kv)
        assert i_l[:, 0].max() == 0.0           # Γ: no longitudinal component
        assert i_t[:, 0].max() > 0.0            # all power counted transverse

    def test_max_freq_filters_rows(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        kv = np.array([[0.5, 0.0, 0.0]], np.float32)
        freqs, i_l, i_t = calc.calculate_lt(kv, max_freq=20.0)
        assert freqs.max() <= 20.0
        assert i_l.shape == (len(freqs), 1) and i_t.shape == (len(freqs), 1)

    def test_chunked_matches_single_dispatch(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        rng = np.random.default_rng(7)
        kv = rng.uniform(-1, 1, (9, 3)).astype(np.float32)
        _, l1, t1 = calc.calculate_lt(kv, k_chunk_size=4)   # 3 chunks (scan)
        _, l2, t2 = calc.calculate_lt(kv, k_chunk_size=64)  # 1 chunk
        np.testing.assert_allclose(l1, l2, rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(t1, t2, rtol=1e-5, atol=1e-9)

    def test_incoherent_sums_groups(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        kv = np.array([[0.5, 0.2, 0.0], [0.0, 0.9, 0.3]], np.float32)
        _, l_inc, t_inc = calc.calculate_lt(kv, basis_atom_types=[1, 2],
                                            summation_mode='incoherent')
        acc_l = np.zeros_like(l_inc)
        acc_t = np.zeros_like(t_inc)
        for typ in (1, 2):
            _, l_g, t_g = calc.calculate_lt(kv, basis_atom_types=[[typ]])
            acc_l += l_g
            acc_t += t_g
        np.testing.assert_allclose(l_inc, acc_l, rtol=1e-5, atol=1e-9)
        np.testing.assert_allclose(t_inc, acc_t, rtol=1e-5, atol=1e-9)

    def test_bad_summation_mode(self, small_trajectory):
        calc = SEDCalculator(small_trajectory, nx=2, ny=2, nz=2)
        with pytest.raises(ValueError, match="summation_mode"):
            calc.calculate_lt(np.zeros((1, 3), np.float32),
                              summation_mode='banana')
