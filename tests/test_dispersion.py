"""Band sorting + group-velocity extraction (ops/dispersion.py).

The reference stops at I(ω, k) heatmaps; group velocities are a rebuild
extension, so these tests define the contract from scratch: unit tests on
synthetic crossing bands, and physics oracles on the chain / square-lattice
trajectories whose analytic dispersions give closed-form ∂ω/∂k.
"""
import numpy as np
import pytest

from psa_tpu import SEDCalculator
from psa_tpu.models import (make_chain_trajectory,
                            make_square_lattice_trajectory,
                            square_lattice_dispersion)
from psa_tpu.ops import dispersion

TWO_PI = 2.0 * np.pi


class TestSortBandsPath:
    def _crossing_bands(self, n_k=41):
        """Two analytic branches that cross mid-path, delivered in
        by-height order (the peaks contract) so the raw rows swap."""
        k = np.linspace(0.0, 1.0, n_k)
        f_a = 2.0 + 3.0 * k                      # rising branch
        f_b = 5.0 - 3.0 * k                      # falling branch
        h_a = np.full(n_k, 2.0)                  # branch a always brighter
        h_b = np.full(n_k, 1.0)
        by_height_f = np.stack([f_a, f_b])
        by_height_h = np.stack([h_a, h_b])
        return k, f_a, f_b, by_height_f, by_height_h

    def test_recovers_continuous_branches(self):
        k, f_a, f_b, freqs, heights = self._crossing_bands()
        sf, sh = dispersion.sort_bands_path(freqs, heights)
        # each output row must be one continuous branch (small |Δf| steps)
        for row in sf:
            assert np.max(np.abs(np.diff(row))) < 0.2
        # the two branches are both present
        rows = {tuple(np.round(r, 6)) for r in sf}
        assert tuple(np.round(np.minimum(f_a, f_b), 6)) in rows or \
               tuple(np.round(f_a, 6)) in rows

    def test_companions_follow_the_permutation(self):
        k, f_a, f_b, freqs, heights = self._crossing_bands()
        sf, sh = dispersion.sort_bands_path(freqs, heights)
        # height 2.0 must still sit wherever branch a's frequency went
        # (skip the crossing column itself, where the branches coincide
        # and either assignment is valid)
        for j in np.flatnonzero(np.abs(f_a - f_b) > 1e-9):
            for b in range(2):
                expected = 2.0 if np.isclose(sf[b, j], f_a[j]) else 1.0
                assert sh[b, j] == expected

    def test_single_band_noop(self):
        f = np.linspace(1, 2, 10)[None, :]
        (out,) = dispersion.sort_bands_path(f)
        np.testing.assert_array_equal(out, f)

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="n_bands"):
            dispersion.sort_bands_path(np.zeros(5))
        with pytest.raises(ValueError, match="companion"):
            dispersion.sort_bands_path(np.zeros((2, 5)), np.zeros((2, 4)))


class TestSortBandsGrid:
    def test_recovers_continuous_sheets(self):
        gx, gy = 12, 10
        kx = np.linspace(0, np.pi, gx)
        ky = np.linspace(0, np.pi, gy)
        KX, KY = np.meshgrid(kx, ky, indexing='ij')
        f_a = 2.0 + np.sin(KX) * np.cos(KY)           # sheet in [1, 3]
        f_b = 5.0 - 2.0 * np.cos(KX) * np.cos(KY)     # sheet in [3, 7]: crosses
        rng = np.random.default_rng(0)
        swap = rng.integers(0, 2, size=(gx, gy)).astype(bool)
        freqs = np.stack([np.where(swap, f_b, f_a), np.where(swap, f_a, f_b)])
        tags = np.stack([np.where(swap, 1.0, 0.0), np.where(swap, 0.0, 1.0)])
        sf, st = dispersion.sort_bands_grid(freqs, tags)
        # sheets reassembled: each band's tag is constant wherever the
        # sheets are separated by more than the sorting ambiguity
        sep = np.abs(f_a - f_b) > 0.5
        for b in range(2):
            vals = st[b][sep]
            assert np.all(vals == vals.flat[0])
        # and frequencies are one of the two analytic sheets there
        match_a = np.isclose(sf[0][sep], f_a[sep]) | np.isclose(sf[0][sep], f_b[sep])
        assert np.all(match_a)

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="gx"):
            dispersion.sort_bands_grid(np.zeros((2, 5)))


class TestGroupVelocityMath:
    def test_path_matches_analytic_derivative(self):
        k = np.linspace(0.1, 2.0, 200)
        f = np.sin(k)                                  # dν/dk = cos k
        v = dispersion.group_velocity_path(f[None, :], k)
        want = TWO_PI * np.cos(k)
        np.testing.assert_allclose(v[0, 1:-1], want[1:-1], atol=1e-2)

    def test_path_nonuniform_spacing(self):
        k = np.sort(np.concatenate([np.linspace(0.1, 1, 60),
                                    np.linspace(1.01, 2, 140)]))
        f = k ** 2                                     # dν/dk = 2k
        v = dispersion.group_velocity_path(f[None, :], k)
        np.testing.assert_allclose(v[0, 1:-1], TWO_PI * 2 * k[1:-1], rtol=1e-3)

    def test_grid_matches_analytic_gradient(self):
        kx = np.linspace(0.1, 1.5, 40)
        ky = np.linspace(-1.0, 1.0, 50)
        KX, KY = np.meshgrid(kx, ky, indexing='ij')
        f = (KX ** 2 + 0.5 * KY ** 2)[None]
        vx, vy = dispersion.group_velocity_grid(f, kx, ky)
        np.testing.assert_allclose(vx[0, 1:-1, :], TWO_PI * 2 * KX[1:-1, :],
                                   rtol=1e-3)
        np.testing.assert_allclose(vy[0, :, 1:-1], TWO_PI * KY[:, 1:-1],
                                   rtol=1e-3, atol=1e-4)

    def test_validation(self):
        with pytest.raises(ValueError, match="shape"):
            dispersion.group_velocity_path(np.zeros((1, 5)), np.zeros(4))
        with pytest.raises(ValueError, match="at least 2"):
            dispersion.group_velocity_path(np.zeros((1, 1)), np.zeros(1))
        with pytest.raises(ValueError, match="shape"):
            dispersion.group_velocity_grid(np.zeros((1, 4, 5)),
                                           np.zeros(4), np.zeros(4))


class TestChainGroupVelocityOracle:
    """1D chain: ν(k) = ν_max |sin(ka/2)| ⇒ v_g = π·a·ν_max·cos(ka/2) for
    0 < k < π/a.  The k-path lands exactly on the chain's allowed modes so
    the only error is FFT-bin quantization of the peak frequencies."""

    def test_group_velocity_matches_analytic(self):
        a, nu_max, n_cells = 2.5, 10.0, 64
        n_frames, dt = 512, 0.05
        traj = make_chain_trajectory(n_cells=n_cells, n_frames=n_frames,
                                     dt_ps=dt, a=a, omega_max_thz=nu_max,
                                     seed=3)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        m = n_cells // 2
        k_mags = np.arange(m + 1) * (np.pi / a) / m   # modes 2πj/(N a)
        k_vecs = np.stack([k_mags, np.zeros(m + 1), np.zeros(m + 1)], axis=1
                          ).astype(np.float32)
        freqs, v, heights = calc.calculate_group_velocity_path(
            k_mags, k_vecs, n_bands=1)
        want_v = np.pi * a * nu_max * np.cos(k_mags * a / 2.0)
        df = 1.0 / (n_frames * dt)                    # bin width, THz
        # central-difference quantization bound: 2π·df/Δk per step
        tol = TWO_PI * df / (k_mags[1] - k_mags[0]) + 1e-3
        # skip Γ (k=0 carries no mode, so its peak frequency is noise) AND
        # its gradient neighbor (the central difference at j=1 reads j=0)
        inner = slice(2, m)
        assert np.max(np.abs(v[0, inner] - want_v[inner])) <= tol
        # and the band frequencies themselves sit on the dispersion
        want_f = nu_max * np.abs(np.sin(k_mags * a / 2.0))
        assert np.max(np.abs(freqs[0, inner] - want_f[inner])) <= df + 1e-6


class TestSquareLatticeGroupVelocityOracle:
    """2D square lattice: the pipeline's (vx, vy) field must match central
    differences of the ANALYTIC surface sampled on the same grid (this
    isolates peak-bin quantization as the only error source)."""

    def test_surface_field_matches_analytic(self):
        a, nu_max, n_cells = 2.5, 10.0, 12
        n_frames, dt = 512, 0.01
        traj = make_square_lattice_trajectory(n_cells=n_cells,
                                              n_frames=n_frames, dt_ps=dt,
                                              a=a, nu_max_thz=nu_max, seed=5)
        calc = SEDCalculator(traj, nx=n_cells, ny=n_cells, nz=1)
        kmax = np.pi / a
        n_half = n_cells // 2 + 1
        _, k_vecs, shape = calc.get_k_grid('xy', (0.0, kmax), (0.0, kmax),
                                           n_half, n_half)
        freqs, vx, vy, heights = calc.calculate_group_velocity_surface(
            k_vecs, shape, n_bands=1)
        kx = np.unique(k_vecs[:, 0].astype(np.float64))
        ky = np.unique(k_vecs[:, 1].astype(np.float64))
        KX, KY = np.meshgrid(kx, ky, indexing='ij')
        analytic = square_lattice_dispersion(KX, KY, a=a, nu_max_thz=nu_max)
        want_vx, want_vy = dispersion.group_velocity_grid(
            analytic[None], kx, ky)
        df = 1.0 / (n_frames * dt)
        tol = TWO_PI * df / (kx[1] - kx[0]) + 1e-3
        # Γ's row/column carry no mode content below resolution — skip them
        assert np.max(np.abs(vx[0, 1:, 1:] - want_vx[0, 1:, 1:])) <= tol
        assert np.max(np.abs(vy[0, 1:, 1:] - want_vy[0, 1:, 1:])) <= tol

    def test_chiral_kwarg_rejected(self):
        traj = make_square_lattice_trajectory(n_cells=4, n_frames=32,
                                              dt_ps=0.01)
        calc = SEDCalculator(traj, nx=4, ny=4, nz=1)
        _, k_vecs, shape = calc.get_k_grid('xy', (0.0, 1.0), (0.0, 1.0), 3, 3)
        with pytest.raises(ValueError, match="chiral"):
            calc.calculate_group_velocity_surface(k_vecs, shape, chiral=True)
