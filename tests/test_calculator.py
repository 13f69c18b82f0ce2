"""Golden parity tests: SEDCalculator vs a float64 NumPy oracle of the
reference formula, plus k-path/k-grid generation, chiral phase, and iSED.

The reference shipped NO engine tests (SURVEY.md §4); these define the
behavioral contract at 1e-6 relative tolerance (the parity bar in BASELINE.json).
"""
import numpy as np
import pytest

from psa_tpu import SED, SEDCalculator
from psa_tpu.models import make_chain_trajectory, make_random_crystal_trajectory

from conftest import reference_sed_oracle

RTOL = 1e-6  # relative to the max |oracle| magnitude


def rel_err(got, want):
    denom = np.max(np.abs(want))
    if denom == 0:
        return np.max(np.abs(got))
    return np.max(np.abs(got - want)) / denom


@pytest.fixture(scope='module')
def crystal():
    return make_random_crystal_trajectory(n_cells_xyz=(3, 3, 2), basis=2,
                                          n_frames=20, dt_ps=0.02, seed=3)


@pytest.fixture(scope='module')
def calc(crystal):
    return SEDCalculator(crystal, nx=3, ny=3, nz=2)


class TestKPath:
    def test_shapes_and_direction(self, calc):
        k_mags, k_vecs = calc.get_k_path([1, 0, 0], bz_coverage=2.0, n_k=17)
        assert k_mags.shape == (17,)
        assert k_vecs.shape == (17, 3)
        assert k_mags[0] == 0
        np.testing.assert_allclose(k_vecs[:, 0], k_mags, atol=1e-6)
        np.testing.assert_allclose(k_vecs[:, 1:], 0, atol=1e-7)

    def test_extent_from_reciprocal_projection(self, calc):
        k_mags, _ = calc.get_k_path('x', bz_coverage=1.0, n_k=3)
        b_proj = max(abs(np.dot([1, 0, 0], b)) for b in (calc.b1, calc.b2, calc.b3))
        np.testing.assert_allclose(k_mags[-1], b_proj, rtol=1e-5)

    def test_extent_from_lat_param(self, calc):
        k_mags, _ = calc.get_k_path('x', bz_coverage=2.0, n_k=3, lat_param=5.0)
        np.testing.assert_allclose(k_mags[-1], 2.0 * 2 * np.pi / 5.0, rtol=1e-5)

    def test_single_k(self, calc):
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=1, lat_param=5.0)
        assert k_mags.shape == (1,)
        np.testing.assert_allclose(k_mags[0], 2 * np.pi / 5.0, rtol=1e-5)

    def test_nk_zero_raises(self, calc):
        with pytest.raises(ValueError, match="n_k"):
            calc.get_k_path('x', bz_coverage=1.0, n_k=0)


class TestKGrid:
    def test_xy_ordering(self, calc):
        _, k_vecs, shape = calc.get_k_grid('xy', (-1, 1), (-2, 2), 3, 5, k_fixed_val=0.5)
        assert shape == (3, 5)
        assert k_vecs.shape == (15, 3)
        # first range (kx) varies slowest; fixed component is z
        np.testing.assert_allclose(k_vecs[:5, 0], -1.0, atol=1e-6)
        np.testing.assert_allclose(k_vecs[:5, 1], np.linspace(-2, 2, 5), atol=1e-6)
        np.testing.assert_allclose(k_vecs[:, 2], 0.5, atol=1e-6)
        # row-major reshape recovers the grid
        grid = k_vecs[:, 0].reshape(3, 5)
        np.testing.assert_allclose(grid[:, 0], np.linspace(-1, 1, 3), atol=1e-6)

    def test_yz_and_zx_component_mapping(self, calc):
        _, k_yz, _ = calc.get_k_grid('yz', (0, 1), (0, 2), 2, 2, k_fixed_val=7.0)
        np.testing.assert_allclose(k_yz[:, 0], 7.0)          # x fixed
        assert set(np.round(k_yz[:, 1], 6)) == {0.0, 1.0}    # first range -> y
        assert set(np.round(k_yz[:, 2], 6)) == {0.0, 2.0}    # second range -> z

        _, k_zx, _ = calc.get_k_grid('zx', (0, 1), (0, 2), 2, 2, k_fixed_val=7.0)
        np.testing.assert_allclose(k_zx[:, 1], 7.0)          # y fixed
        assert set(np.round(k_zx[:, 2], 6)) == {0.0, 1.0}    # first range -> z
        assert set(np.round(k_zx[:, 0], 6)) == {0.0, 2.0}    # second range -> x

    def test_invalid_plane(self, calc):
        with pytest.raises(ValueError, match="Invalid plane"):
            calc.get_k_grid('ab', (0, 1), (0, 1), 2, 2)

    def test_nonpositive_counts(self, calc):
        with pytest.raises(ValueError, match="must be positive"):
            calc.get_k_grid('xy', (0, 1), (0, 1), 0, 2)


class TestCoherentParity:
    def test_all_atoms(self, crystal, calc):
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=13)
        sed = calc.calculate(k_mags, k_vecs)
        oracle = reference_sed_oracle(crystal, k_vecs)
        assert sed.is_complex
        assert sed.sed.dtype == np.complex64
        assert rel_err(sed.sed, oracle) < RTOL

    def test_chunked_equals_unchunked(self, calc):
        k_mags, k_vecs = calc.get_k_path('xy', bz_coverage=1.0, n_k=23)
        a = calc.calculate(k_mags, k_vecs, k_chunk_size=5)
        b = calc.calculate(k_mags, k_vecs, k_chunk_size=1000)
        np.testing.assert_allclose(a.sed, b.sed, atol=1e-7)

    def test_type_basis_union(self, crystal, calc):
        k_mags, k_vecs = calc.get_k_path('y', bz_coverage=1.0, n_k=7)
        sed = calc.calculate(k_mags, k_vecs, basis_atom_types=[1, 2],
                             summation_mode='coherent')
        idx = np.where(np.isin(crystal.types, [1, 2]))[0]
        oracle = reference_sed_oracle(crystal, k_vecs, group_idx=idx)
        assert rel_err(sed.sed, oracle) < RTOL

    def test_index_basis(self, crystal, calc):
        k_mags, k_vecs = calc.get_k_path('z', bz_coverage=1.0, n_k=7)
        idx = np.arange(0, crystal.n_atoms, 2)
        sed = calc.calculate(k_mags, k_vecs, basis_atom_indices=idx)
        oracle = reference_sed_oracle(crystal, k_vecs, group_idx=idx)
        assert rel_err(sed.sed, oracle) < RTOL

    def test_multi_group_coherent_is_union(self, crystal, calc):
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=5)
        sed = calc.calculate(k_mags, k_vecs,
                             basis_atom_indices=[[0, 1, 2], [2, 3, 4]],
                             summation_mode='coherent')
        union = np.unique([0, 1, 2, 2, 3, 4])
        oracle = reference_sed_oracle(crystal, k_vecs, group_idx=union)
        assert rel_err(sed.sed, oracle) < RTOL

    def test_displacements_mode(self, crystal):
        calc_d = SEDCalculator(crystal, nx=3, ny=3, nz=2, use_displacements=True)
        k_mags, k_vecs = calc_d.get_k_path('x', bz_coverage=1.0, n_k=9)
        sed = calc_d.calculate(k_mags, k_vecs)
        oracle = reference_sed_oracle(crystal, k_vecs, use_displacements=True)
        assert rel_err(sed.sed, oracle) < RTOL

    def test_out_of_bounds_indices_raise(self, calc):
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=3)
        with pytest.raises(ValueError, match="out of bounds"):
            calc.calculate(k_mags, k_vecs, basis_atom_indices=[10_000])


class TestIncoherentParity:
    def test_flat_type_list_splits_into_groups(self, crystal, calc):
        """Incoherent + flat type list -> one singleton group per type
        (reference sed_calculator.py:219-223)."""
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=9)
        sed = calc.calculate(k_mags, k_vecs, basis_atom_types=[1, 2],
                             summation_mode='incoherent')
        assert not sed.is_complex
        assert sed.sed.dtype == np.float32
        expected = np.zeros(sed.sed.shape)
        for t in (1, 2):
            idx = np.where(crystal.types == t)[0]
            spec = reference_sed_oracle(crystal, k_vecs, group_idx=idx)
            expected += np.sum(np.abs(spec) ** 2, axis=-1)
        assert rel_err(sed.sed, expected) < RTOL

    def test_single_group_incoherent_is_complex(self, calc):
        """Incoherent with one group keeps complex output (reference :276)."""
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=5)
        sed = calc.calculate(k_mags, k_vecs, basis_atom_types=[[1, 2]],
                             summation_mode='incoherent')
        assert sed.is_complex

    def test_index_group_lists(self, crystal, calc):
        k_mags, k_vecs = calc.get_k_path('y', bz_coverage=1.0, n_k=6)
        groups = [[0, 1, 2, 3], [4, 5, 6, 7, 8]]
        sed = calc.calculate(k_mags, k_vecs, basis_atom_indices=groups,
                             summation_mode='incoherent')
        expected = np.zeros(sed.sed.shape)
        for g in groups:
            spec = reference_sed_oracle(crystal, k_vecs, group_idx=np.array(g))
            expected += np.sum(np.abs(spec) ** 2, axis=-1)
        assert rel_err(sed.sed, expected) < RTOL

    def test_invalid_mode_raises(self, calc):
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=3)
        with pytest.raises(ValueError, match="summation_mode"):
            calc.calculate(k_mags, k_vecs, summation_mode='bogus')


class TestStreamedPath:
    def test_streaming_matches_resident(self, crystal):
        """Force the atom-streamed projection and compare to the resident path."""
        small = SEDCalculator(crystal, nx=3, ny=3, nz=2, max_device_bytes=1_000)
        big = SEDCalculator(crystal, nx=3, ny=3, nz=2)
        k_mags, k_vecs = big.get_k_path('x', bz_coverage=1.0, n_k=8)
        a = small.calculate(k_mags, k_vecs)
        b = big.calculate(k_mags, k_vecs)
        assert rel_err(a.sed, b.sed) < 1e-6


class TestChiralPhase:
    @pytest.fixture(scope='class')
    def z_pair(self):
        rng = np.random.default_rng(7)
        z1 = (rng.normal(size=(12, 9)) + 1j * rng.normal(size=(12, 9))).astype(np.complex64)
        z2 = (rng.normal(size=(12, 9)) + 1j * rng.normal(size=(12, 9))).astype(np.complex64)
        z1[0, 0] = 0  # exercise the magnitude guard
        return z1, z2

    def _oracle(self, z1, z2, opt):
        """Direct float64 port of the reference's per-element loop
        (sed_calculator.py:344-371)."""
        if opt == 'C':
            d = np.angle(z1) - np.angle(z2)
            d = (d + np.pi) % (2 * np.pi) - np.pi
            d[d > np.pi / 2] = np.pi - d[d > np.pi / 2]
            d[d < -np.pi / 2] = -np.pi - d[d < -np.pi / 2]
            return d.astype(np.float32)
        out = np.zeros(z1.shape, dtype=np.float32)
        for i in range(z1.shape[0]):
            for j in range(z1.shape[1]):
                v1, v2 = z1[i, j], z2[i, j]
                m1sq, m2sq = abs(v1) ** 2, abs(v2) ** 2
                if m1sq < 1e-18 or m2sq < 1e-18:
                    continue
                m1, m2 = np.sqrt(m1sq), np.sqrt(m2sq)
                if opt == 'A':
                    out[i, j] = np.arccos(np.clip(
                        (v1.real * v2.real + v1.imag * v2.imag) / (m1 * m2), -1, 1))
                else:
                    out[i, j] = np.arcsin(np.clip(
                        (v1.real * v2.imag - v1.imag * v2.real) / (m1 * m2), -1, 1))
        return out

    @pytest.mark.parametrize('opt', ['A', 'B', 'C'])
    def test_parity(self, calc, z_pair, opt):
        z1, z2 = z_pair
        got = calc.calculate_chiral_phase(z1, z2, angle_range_opt=opt)
        want = self._oracle(z1, z2, opt)
        if opt == 'C':
            np.testing.assert_allclose(got, want, atol=2e-6)
        elif opt == 'A':
            # arccos has unbounded derivative at ratio ±1, so 1-ulp f32
            # differences in the ratio explode in angle space; compare the
            # ratio (cos of the angle) instead.
            np.testing.assert_allclose(np.cos(got), np.cos(want), atol=2e-6)
        else:
            np.testing.assert_allclose(np.sin(got), np.sin(want), atol=2e-6)

    def test_option_c_range(self, calc, z_pair):
        z1, z2 = z_pair
        p = calc.calculate_chiral_phase(z1, z2, 'C')
        assert np.all(p >= -np.pi / 2 - 1e-6) and np.all(p <= np.pi / 2 + 1e-6)

    def test_shape_mismatch(self, calc):
        with pytest.raises(ValueError, match="shapes must match"):
            calc.calculate_chiral_phase(np.zeros((2, 2), complex), np.zeros((3, 2), complex))

    def test_empty(self, calc):
        out = calc.calculate_chiral_phase(np.zeros((0, 2), complex), np.zeros((0, 2), complex))
        assert out.shape == (0, 2)


class TestChainPhysics:
    def test_dispersion_peaks_on_analytic_curve(self):
        """SED intensity of a synthetic chain must peak on ω = ω_max|sin(ka/2)|."""
        a, omega_max = 2.5, 10.0
        n_cells = 32
        traj = make_chain_trajectory(n_cells=n_cells, n_frames=256, dt_ps=0.02,
                                     a=a, omega_max_thz=omega_max, seed=0)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        # bz_coverage 0.5 spans Γ..BZ-edge; n_k = n_cells/2 + 1 puts every probe
        # k exactly on a chain normal-mode wavevector (spacing 2π/(N a)).
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=n_cells // 2 + 1)
        sed = calc.calculate(k_mags, k_vecs)
        inten = sed.intensity
        freqs = sed.freqs
        pos = freqs >= 0
        peak_freqs = freqs[pos][np.argmax(inten[pos], axis=0)]
        analytic = omega_max * np.abs(np.sin(k_mags * a / 2))
        df = 1.0 / (traj.n_frames * traj.dt_ps)  # frequency resolution
        # skip k=0 (no mode content there)
        assert np.all(np.abs(peak_freqs[1:] - analytic[1:]) <= df + 1e-6)


class TestISED:
    def test_dump_written_and_parsable(self, tmp_path):
        traj = make_chain_trajectory(n_cells=16, n_frames=64, dt_ps=0.05)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        dump = tmp_path / "recon.dump"
        calc.ised(k_dir_spec='x', k_target=0.6, w_target=5.0, char_len_k_path=2.5,
                  nk_on_path=20, bz_cov_ised=1.0, rescale_factor='auto',
                  n_recon_frames=10, dump_filepath=str(dump))
        assert dump.exists()
        text = dump.read_text()
        assert text.count("ITEM: TIMESTEP") == 10
        assert "ITEM: ATOMS id type x y z" in text
        # round-trip through our own reader
        from psa_tpu.io.lammps import read_lammps_dump
        pos, vel, types, steps, box = read_lammps_dump(dump, unwrap=False)
        assert pos.shape == (10, 16, 3)
        assert np.all(types == 1)

    def test_ised_with_plot(self, tmp_path):
        traj = make_chain_trajectory(n_cells=16, n_frames=64, dt_ps=0.05)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        calc.ised(k_dir_spec='x', k_target=0.6, w_target=5.0, char_len_k_path=2.5,
                  nk_on_path=16, n_recon_frames=6,
                  dump_filepath=str(tmp_path / "r.dump"),
                  plot_dir_ised=tmp_path)
        pngs = list(tmp_path.glob("iSED_*.png"))
        assert len(pngs) == 1

    def test_type_groups(self, tmp_path, crystal):
        calc = SEDCalculator(crystal, nx=3, ny=3, nz=2)
        dump = tmp_path / "recon2.dump"
        calc.ised(k_dir_spec=[1, 0, 0], k_target=0.5, w_target=5.0,
                  char_len_k_path=5.43, nk_on_path=12,
                  basis_atom_types_ised=[1, 2],
                  rescale_factor=2.0, n_recon_frames=4, dump_filepath=str(dump))
        assert dump.exists()


class TestEmptyEdges:
    def test_zero_kvectors(self, calc):
        sed = calc.calculate(np.array([]), np.zeros((0, 3), dtype=np.float32))
        assert sed.sed.shape[1] == 0

    def test_empty_basis_falls_back_to_all(self, crystal, calc):
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=4)
        sed = calc.calculate(k_mags, k_vecs, basis_atom_indices=[])
        oracle = reference_sed_oracle(crystal, k_vecs)
        assert rel_err(sed.sed, oracle) < RTOL

    def test_precision_validation(self, crystal):
        with pytest.raises(ValueError, match="precision"):
            SEDCalculator(crystal, 1, 1, 1, precision='bogus')

    def test_bad_dims(self, crystal):
        with pytest.raises(ValueError, match="must be positive"):
            SEDCalculator(crystal, 0, 1, 1)


class TestMassWeighting:
    """Opt-in √m weighting (extension; the reference never implemented it)."""

    def test_requires_masses(self, crystal):
        with pytest.raises(ValueError, match="masses"):
            SEDCalculator(crystal, 3, 3, 2, mass_weighted=True)

    def test_weighted_matches_manual(self, crystal):
        import dataclasses
        rng = np.random.default_rng(11)
        masses = rng.uniform(1.0, 30.0, crystal.n_atoms)
        traj_m = dataclasses.replace(crystal, masses=masses)
        calc = SEDCalculator(traj_m, 3, 3, 2, mass_weighted=True)
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=7)
        sed = calc.calculate(k_mags, k_vecs)

        # manual oracle: scale velocities by sqrt(m) then reference formula
        scaled = dataclasses.replace(
            crystal, velocities=(crystal.velocities
                                 * np.sqrt(masses)[None, :, None].astype(np.float32)))
        oracle = reference_sed_oracle(scaled, k_vecs)
        assert rel_err(sed.sed, oracle) < 1e-5

    def test_default_unweighted(self, crystal):
        import dataclasses
        traj_m = dataclasses.replace(crystal, masses=np.full(crystal.n_atoms, 7.0))
        calc = SEDCalculator(traj_m, 3, 3, 2)   # default off
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=5)
        sed = calc.calculate(k_mags, k_vecs)
        oracle = reference_sed_oracle(crystal, k_vecs)
        assert rel_err(sed.sed, oracle) < RTOL


class TestFastPrecision:
    def test_fast_mode_close_enough(self, crystal):
        calc = SEDCalculator(crystal, 3, 3, 2, precision='fast')
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=1.0, n_k=9)
        sed = calc.calculate(k_mags, k_vecs)
        oracle = reference_sed_oracle(crystal, k_vecs)
        # bf16 passes: expect ~1e-2 relative, far looser than parity mode
        assert rel_err(sed.sed, oracle) < 5e-2


class TestDiatomicChainPhysics:
    """Acoustic + optical branches of a diatomic chain: the SED must show the
    analytic gap, and the optical branch must appear at the zone boundary."""

    def test_two_branch_dispersion(self):
        from psa_tpu.models import (diatomic_chain_branches,
                                    make_diatomic_chain_trajectory)
        n_cells, a, kappa, m1, m2 = 32, 5.0, 800.0, 1.0, 3.0
        traj = make_diatomic_chain_trajectory(n_cells=n_cells, n_frames=1024,
                                              dt_ps=0.01, a=a, kappa=kappa,
                                              m1=m1, m2=m2, seed=2)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        # probe exactly the synthesized mode wavevectors
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5,
                                         n_k=n_cells // 2 + 1)
        sed = calc.calculate(k_mags, k_vecs)
        inten = sed.intensity
        freqs = sed.freqs
        pos = freqs >= 0
        f_pos = freqs[pos]
        inten_pos = inten[pos]
        df = 1.0 / (traj.n_frames * traj.dt_ps)

        w_ac, w_op, _, _ = diatomic_chain_branches(k_mags * a, kappa, m1, m2)
        f_ac = w_ac / (2 * np.pi)   # rad/ps -> THz
        f_op = w_op / (2 * np.pi)

        # at each probed k (skip Γ), intensity must peak near BOTH branches:
        # compare local maxima at the two analytic frequencies vs background
        for i in range(2, len(k_mags), 4):
            col = inten_pos[:, i]
            for f_target in (f_ac[i], f_op[i]):
                idx = int(np.argmin(np.abs(f_pos - f_target)))
                lo, hi = max(0, idx - 2), min(len(col), idx + 3)
                local = col[lo:hi].max()
                assert local > 10 * np.median(col), (i, f_target)

    def test_optical_branch_antiphase_types(self):
        """Incoherent type-resolved SED keeps optical weight at the zone
        boundary where the coherent all-atom sum partially cancels."""
        from psa_tpu.models import make_diatomic_chain_trajectory
        traj = make_diatomic_chain_trajectory(n_cells=16, n_frames=512,
                                              dt_ps=0.01, seed=3)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=9)
        inc = calc.calculate(k_mags, k_vecs, basis_atom_types=[1, 2],
                             summation_mode='incoherent')
        assert not inc.is_complex
        assert np.all(inc.sed >= 0)
        assert inc.sed.max() > 0


class TestKGridBrowse:
    """Device-reduced grid browsing must equal the full path, filtered."""

    @pytest.fixture(scope='class')
    def setup(self):
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=11)
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        _, k_vecs, shape = calc.get_k_grid('xy', (-1, 1), (-1, 1), 5, 4)
        return calc, k_vecs, shape

    def test_coherent_matches_full(self, setup):
        calc, k_vecs, shape = setup
        freqs, inten, phase = calc.calculate_kgrid_browse(k_vecs)
        full = calc.calculate(np.array([]), k_vecs, k_grid_shape=shape)
        mask = full.freqs >= 0
        np.testing.assert_allclose(freqs, full.freqs[mask])
        np.testing.assert_allclose(inten, full.intensity[mask], rtol=1e-6, atol=1e-9)
        assert phase is None

    def test_max_freq_filter(self, setup):
        calc, k_vecs, shape = setup
        freqs, inten, _ = calc.calculate_kgrid_browse(k_vecs, max_freq=10.0)
        full = calc.calculate(np.array([]), k_vecs, k_grid_shape=shape)
        mask = (full.freqs >= 0) & (full.freqs <= 10.0)
        assert len(freqs) == mask.sum() < (full.freqs >= 0).sum()
        np.testing.assert_allclose(inten, full.intensity[mask], rtol=1e-6, atol=1e-9)

    def test_chiral_phase_matches_full(self, setup):
        calc, k_vecs, shape = setup
        freqs, inten, phase = calc.calculate_kgrid_browse(k_vecs, chiral=True,
                                                          chiral_axis='z')
        full = calc.calculate(np.array([]), k_vecs, k_grid_shape=shape)
        ph_full = calc.calculate_chiral_phase(full.sed[:, :, 0], full.sed[:, :, 1])
        mask = full.freqs >= 0
        np.testing.assert_allclose(phase, ph_full[mask], rtol=0, atol=1e-5)

    def test_incoherent_multigroup_matches_full(self, setup):
        calc, k_vecs, shape = setup
        freqs, inten, phase = calc.calculate_kgrid_browse(
            k_vecs, basis_atom_types=[1, 2], summation_mode='incoherent')
        full = calc.calculate(np.array([]), k_vecs, basis_atom_types=[1, 2],
                              summation_mode='incoherent', k_grid_shape=shape)
        mask = full.freqs >= 0
        # incoherent SEDs carry intensities directly in .sed
        np.testing.assert_allclose(inten, full.sed[mask], rtol=1e-6, atol=1e-9)
        assert phase is None

    def test_chiral_incoherent_rejected(self, setup):
        calc, k_vecs, shape = setup
        with pytest.raises(ValueError, match="coherent"):
            calc.calculate_kgrid_browse(k_vecs, basis_atom_types=[1, 2],
                                        summation_mode='incoherent', chiral=True)


class TestBrowseScanPath:
    """Multi-chunk browses take the single-dispatch lax.map path; it must
    match the per-chunk path exactly."""

    def test_scan_matches_loop(self):
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=13)
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        _, k_vecs, shape = calc.get_k_grid('xy', (-1, 1), (-1, 1), 13, 11)
        # k_chunk_size=40 -> padded block 64, 143 points -> 4 chunks (scan)
        f_s, i_s, p_s = calc.calculate_kgrid_browse(k_vecs, k_chunk_size=40,
                                                    chiral=True, chiral_axis='y')
        # huge chunk -> 1 chunk -> per-chunk loop path
        f_l, i_l, p_l = calc.calculate_kgrid_browse(k_vecs, k_chunk_size=4096,
                                                    chiral=True, chiral_axis='y')
        np.testing.assert_allclose(f_s, f_l)
        np.testing.assert_allclose(i_s, i_l, rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(p_s, p_l, rtol=0, atol=1e-5)

    def test_scan_skipped_for_streamed_groups(self):
        """Groups over the device budget must fall back to the per-chunk
        (atom-streamed) path and still be correct."""
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=13)
        small = SEDCalculator(traj, nx=3, ny=2, nz=2, max_device_bytes=1 << 12)
        big = SEDCalculator(traj, nx=3, ny=2, nz=2)
        _, k_vecs, _ = small.get_k_grid('xy', (-1, 1), (-1, 1), 9, 9)
        f1, i1, _ = small.calculate_kgrid_browse(k_vecs, k_chunk_size=30)
        f2, i2, _ = big.calculate_kgrid_browse(k_vecs, k_chunk_size=30)
        np.testing.assert_allclose(i1, i2, rtol=2e-5, atol=1e-8)


class TestSquareLatticePhysics:
    """2D grid-engine physics oracle: the k-grid SED of a synthetic square
    lattice must peak on the analytic dispersion surface ν(kx, ky) at every
    allowed grid point — through the direct browse, the fused gridded browse,
    and the full calculate() path."""

    @pytest.fixture(scope='class')
    def lattice(self):
        from psa_tpu.models import make_square_lattice_trajectory
        n_cells = 12
        traj = make_square_lattice_trajectory(n_cells=n_cells, n_frames=256,
                                              dt_ps=0.01, a=2.5,
                                              nu_max_thz=10.0, seed=4)
        calc = SEDCalculator(traj, nx=n_cells, ny=n_cells, nz=1)
        # grid exactly on the allowed modes: k = 2π m / (N a), m = 0..N/2
        kmax = 2 * np.pi / 2.5 / 2          # zone boundary π/a
        n_half = n_cells // 2 + 1
        _, k_vecs, shape = calc.get_k_grid('xy', (0.0, kmax), (0.0, kmax),
                                           n_half, n_half)
        return traj, calc, k_vecs, shape

    def _check_peaks(self, freqs, intensity, k_vecs, traj):
        from psa_tpu.models import square_lattice_dispersion
        analytic = square_lattice_dispersion(k_vecs[:, 0], k_vecs[:, 1],
                                             a=2.5, nu_max_thz=10.0)
        peak = freqs[np.argmax(intensity, axis=0)]
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        ok = analytic > df          # skip Γ (no mode content below resolution)
        assert np.all(np.abs(peak[ok] - analytic[ok]) <= df + 1e-6), \
            np.max(np.abs(peak[ok] - analytic[ok]))

    def test_direct_browse_peaks_on_surface(self, lattice):
        traj, calc, k_vecs, shape = lattice
        freqs, inten, _ = calc.calculate_kgrid_browse(k_vecs)
        self._check_peaks(freqs, inten, k_vecs, traj)

    def test_gridded_browse_peaks_on_surface(self, lattice):
        traj, calc, k_vecs, shape = lattice
        freqs, inten, _ = calc.calculate_kgrid_browse(k_vecs, engine='gridded',
                                                      k_grid_shape=shape)
        self._check_peaks(freqs, inten, k_vecs, traj)

    def test_full_calculate_peaks_on_surface(self, lattice):
        traj, calc, k_vecs, shape = lattice
        sed = calc.calculate(np.array([]), k_vecs, k_grid_shape=shape)
        mask = sed.freqs >= 0
        self._check_peaks(sed.freqs[mask], sed.intensity[mask], k_vecs, traj)

    def test_incoherent_scan_matches_loop(self):
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=13)
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        _, k_vecs, _ = calc.get_k_grid('xy', (-1, 1), (-1, 1), 13, 11)
        f_s, i_s, _ = calc.calculate_kgrid_browse(
            k_vecs, basis_atom_types=[1, 2], summation_mode='incoherent',
            k_chunk_size=40)                               # 4 chunks -> scan
        f_l, i_l, _ = calc.calculate_kgrid_browse(
            k_vecs, basis_atom_types=[1, 2], summation_mode='incoherent',
            k_chunk_size=4096)                             # 1 chunk -> loop
        np.testing.assert_allclose(i_s, i_l, rtol=1e-5, atol=1e-8)


class TestChiralPhononPhysics:
    """Analytic chiral-phonon oracle: a chain carrying ONE circularly
    polarized transverse mode (u_z lagging/leading u_y by π/2) must show a
    chiral phase of exactly handedness·π/2 at the synthesized (k, ν) — this
    pins the SIGN convention of calculate_chiral_phase (reference
    sed_calculator.py:344-350) and the chiral_axis='x' → (y, z) component
    mapping, which parity tests alone cannot distinguish from a global
    sign flip."""

    N_CELLS, A, NU, MODE = 32, 2.5, 5.0, 8

    def _mode_kvec(self):
        k = 2 * np.pi * self.MODE / (self.N_CELLS * self.A)
        return np.array([[k, 0.0, 0.0]], dtype=np.float32)

    @pytest.mark.parametrize('h', [+1, -1])
    def test_phase_sign_tracks_handedness(self, h):
        from psa_tpu.models import make_chiral_chain_trajectory
        traj = make_chiral_chain_trajectory(n_cells=self.N_CELLS, n_frames=250,
                                            dt_ps=0.02, a=self.A,
                                            nu_thz=self.NU, mode_index=self.MODE,
                                            handedness=h, seed=3)
        calc = SEDCalculator(traj, nx=self.N_CELLS, ny=1, nz=1)
        k_vecs = self._mode_kvec()
        sed = calc.calculate(np.array([np.linalg.norm(k_vecs[0])]), k_vecs)

        # peak must sit at +ν with the energy in the transverse components
        pos = sed.freqs >= 0
        inten = sed.intensity[pos]
        peak_row = int(np.argmax(inten[:, 0]))
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        assert abs(sed.freqs[pos][peak_row] - self.NU) <= df + 1e-6
        amp2 = np.abs(sed.sed[pos][peak_row, 0, :]) ** 2
        assert amp2[0] < 1e-3 * (amp2[1] + amp2[2])   # x is silent
        np.testing.assert_allclose(amp2[1], amp2[2], rtol=1e-3)  # circular

        phase = calc.calculate_chiral_phase(sed.sed[:, :, 1], sed.sed[:, :, 2],
                                            angle_range_opt='C')
        got = phase[pos][peak_row, 0]
        assert abs(got - h * np.pi / 2) < 0.05, (h, got)

    @pytest.mark.parametrize('h', [+1, -1])
    def test_browse_chiral_axis_x_matches(self, h):
        from psa_tpu.models import make_chiral_chain_trajectory
        traj = make_chiral_chain_trajectory(n_cells=self.N_CELLS, n_frames=250,
                                            dt_ps=0.02, a=self.A,
                                            nu_thz=self.NU, mode_index=self.MODE,
                                            handedness=h, seed=3)
        calc = SEDCalculator(traj, nx=self.N_CELLS, ny=1, nz=1)
        freqs, inten, phase = calc.calculate_kgrid_browse(
            self._mode_kvec(), chiral=True, chiral_axis='x')
        peak_row = int(np.argmax(inten[:, 0]))
        assert abs(phase[peak_row, 0] - h * np.pi / 2) < 0.05


class TestKGridPeaks:
    """On-device peak extraction (calculate_kgrid_peaks / ops.peak_reduce):
    device output must match the NumPy mirror exactly, and the extracted
    peak surface must reproduce the analytic physics oracles."""

    def test_peak_reduce_matches_numpy_mirror(self):
        from psa_tpu.core.calculator import peaks_np
        from psa_tpu.ops import spectral
        import jax.numpy as jnp
        rng = np.random.default_rng(7)
        n_chunks, n_f, block = 3, 40, 64
        planes = rng.uniform(0, 1, size=(n_chunks, n_f, block)).astype(np.float32)
        freqs = np.linspace(0, 20, n_f).astype(np.float32)
        pf_d, ph_d, pw_d = spectral.peak_reduce(jnp.asarray(planes),
                                                jnp.asarray(freqs),
                                                n_peaks=3, exclusion_bins=4)
        for c in range(n_chunks):
            pf_n, ph_n, pw_n = peaks_np(planes[c], freqs, n_peaks=3,
                                        exclusion_bins=4)
            np.testing.assert_allclose(np.asarray(pf_d)[c], pf_n, atol=0)
            np.testing.assert_allclose(np.asarray(ph_d)[c], ph_n, rtol=1e-6)
            np.testing.assert_allclose(np.asarray(pw_d)[c], pw_n,
                                       rtol=1e-4, atol=1e-5)

    def test_square_lattice_peak_surface(self):
        from psa_tpu.models import (make_square_lattice_trajectory,
                                    square_lattice_dispersion)
        n_cells = 12
        traj = make_square_lattice_trajectory(n_cells=n_cells, n_frames=256,
                                              dt_ps=0.01, a=2.5,
                                              nu_max_thz=10.0, seed=4)
        calc = SEDCalculator(traj, nx=n_cells, ny=n_cells, nz=1)
        kmax = 2 * np.pi / 2.5 / 2
        n_half = n_cells // 2 + 1
        _, k_vecs, _ = calc.get_k_grid('xy', (0.0, kmax), (0.0, kmax),
                                       n_half, n_half)
        pf, ph, pw = calc.calculate_kgrid_peaks(k_vecs, n_peaks=1,
                                                k_chunk_size=17)
        analytic = square_lattice_dispersion(k_vecs[:, 0], k_vecs[:, 1],
                                             a=2.5, nu_max_thz=10.0)
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        ok = analytic > df
        assert np.all(np.abs(pf[0][ok] - analytic[ok]) <= df + 1e-6)
        assert np.all(ph[0][ok] > 0)
        assert np.all(pw[0][ok] >= 0)

    def test_diatomic_two_peaks_hit_both_branches(self):
        from psa_tpu.models import (diatomic_chain_branches,
                                    make_diatomic_chain_trajectory)
        n_cells, a, kappa, m1, m2 = 32, 5.0, 800.0, 1.0, 3.0
        traj = make_diatomic_chain_trajectory(n_cells=n_cells, n_frames=1024,
                                              dt_ps=0.01, a=a, kappa=kappa,
                                              m1=m1, m2=m2, seed=2)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5,
                                         n_k=n_cells // 2 + 1)
        pf, ph, _ = calc.calculate_kgrid_peaks(k_vecs, n_peaks=2,
                                               exclusion_bins=6)
        w_ac, w_op, _, _ = diatomic_chain_branches(k_mags * a, kappa, m1, m2)
        f_ac, f_op = w_ac / (2 * np.pi), w_op / (2 * np.pi)
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        for i in range(2, len(k_mags), 4):
            got = np.sort(pf[:, i])
            want = np.sort([f_ac[i], f_op[i]])
            # each branch within a few frequency bins (finite windowing)
            assert np.all(np.abs(got - want) <= 3 * df + 1e-6), (i, got, want)

    def test_incoherent_peaks_match_browse_planes(self):
        from psa_tpu.core.calculator import peaks_np
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=32, dt_ps=0.02, seed=13)
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        _, k_vecs, _ = calc.get_k_grid('xy', (-1, 1), (-1, 1), 9, 9)
        pf, ph, pw = calc.calculate_kgrid_peaks(
            k_vecs, basis_atom_types=[1, 2], summation_mode='incoherent',
            n_peaks=2, k_chunk_size=30)
        freqs, inten, _ = calc.calculate_kgrid_browse(
            k_vecs, basis_atom_types=[1, 2], summation_mode='incoherent',
            k_chunk_size=30)
        pf_n, ph_n, pw_n = peaks_np(inten, freqs, n_peaks=2)
        np.testing.assert_allclose(pf, pf_n, atol=0)
        np.testing.assert_allclose(ph, ph_n, rtol=1e-4)
        np.testing.assert_allclose(pw, pw_n, rtol=1e-3, atol=1e-5)

    def test_oversize_group_falls_back_to_host(self):
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=13)
        small = SEDCalculator(traj, nx=3, ny=2, nz=2, max_device_bytes=1 << 12)
        big = SEDCalculator(traj, nx=3, ny=2, nz=2)
        _, k_vecs, _ = small.get_k_grid('xy', (-1, 1), (-1, 1), 9, 9)
        pf1, ph1, _ = small.calculate_kgrid_peaks(k_vecs, n_peaks=2)
        pf2, ph2, _ = big.calculate_kgrid_peaks(k_vecs, n_peaks=2)
        np.testing.assert_allclose(pf1, pf2, atol=0)
        np.testing.assert_allclose(ph1, ph2, rtol=2e-4)

    def test_lorentzian_fwhm_recovers_injected_linewidth(self):
        """Calibrated linewidth oracle (VERDICT r2 item 7): a damped mode
        v(t) = e^{-Γt}·cos(ω₀t) has a Lorentzian intensity spectrum of
        FWHM = Γ/π (THz, t in ps); width_method='lorentzian' must recover
        it, while the RMS proxy does not."""
        from psa_tpu.core.trajectory import Trajectory, make_box_arrays
        n_t, n_atoms, dt = 4096, 8, 0.01
        t = np.arange(n_t) * dt
        df = 1.0 / (n_t * dt)
        nu0 = 200 * df                      # exactly on a frequency bin
        gamma = 0.5                         # amplitude decay rate (1/ps)
        fwhm_true = gamma / np.pi           # intensity FWHM in THz
        v = (np.exp(-gamma * t) * np.cos(2 * np.pi * nu0 * t)).astype(np.float32)
        velocities = np.zeros((n_t, n_atoms, 3), dtype=np.float32)
        velocities[:, :, 0] = v[:, None]
        positions = np.broadcast_to(
            (np.arange(n_atoms, dtype=np.float32) * 2.5)[None, :, None]
            * np.array([1, 0, 0], np.float32), (n_t, n_atoms, 3))
        box = np.diag([n_atoms * 2.5, 10.0, 10.0]).astype(np.float32)
        lengths, tilts = make_box_arrays(box)
        traj = Trajectory(np.ascontiguousarray(positions), velocities,
                          np.ones(n_atoms, np.int32),
                          np.arange(n_t, dtype=np.float32), box_matrix=box,
                          box_lengths=lengths, box_tilts=tilts, dt_ps=dt)
        calc = SEDCalculator(traj, nx=n_atoms, ny=1, nz=1)
        kv = np.zeros((1, 3), dtype=np.float32)   # k=0: coherent sum of all
        pf, ph, pw = calc.calculate_kgrid_peaks(
            kv, n_peaks=1, exclusion_bins=12, width_method='lorentzian')
        assert abs(pf[0, 0] - nu0) <= df + 1e-6
        assert abs(pw[0, 0] - fwhm_true) / fwhm_true < 0.05, \
            (pw[0, 0], fwhm_true)
        # the RMS proxy measures the window spread, not the FWHM
        _, _, pw_rms = calc.calculate_kgrid_peaks(kv, n_peaks=1,
                                                  exclusion_bins=12)
        assert abs(pw_rms[0, 0] - fwhm_true) / fwhm_true > 0.15

    def test_lorentzian_device_matches_numpy_mirror(self):
        from psa_tpu.core.calculator import peaks_np
        from psa_tpu.ops import spectral
        import jax.numpy as jnp
        rng = np.random.default_rng(11)
        n_chunks, n_f, block = 2, 48, 32
        planes = rng.uniform(0.1, 1, size=(n_chunks, n_f, block)).astype(np.float32)
        freqs = np.linspace(0, 12, n_f).astype(np.float32)
        pf_d, ph_d, pw_d = spectral.peak_reduce(
            jnp.asarray(planes), jnp.asarray(freqs), n_peaks=2,
            exclusion_bins=5, width_method='lorentzian')
        for c in range(n_chunks):
            pf_n, ph_n, pw_n = peaks_np(planes[c], freqs, n_peaks=2,
                                        exclusion_bins=5,
                                        width_method='lorentzian')
            np.testing.assert_allclose(np.asarray(pf_d)[c], pf_n, atol=0)
            np.testing.assert_allclose(np.asarray(pw_d)[c], pw_n,
                                       rtol=5e-3, atol=1e-4)
        with pytest.raises(ValueError, match="width_method"):
            peaks_np(planes[0], freqs, width_method='bogus')

    def test_sharded_lorentzian_matches_single_chip(self):
        from psa_tpu.core.calculator import SEDCalculator
        from psa_tpu.parallel import make_mesh
        traj = make_random_crystal_trajectory(n_cells_xyz=(3, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=9)
        calc = SEDCalculator(traj, nx=3, ny=2, nz=2)
        kv = np.outer(np.linspace(0, 1.0, 6), [1, 0, 0]).astype(np.float32)
        mesh = make_mesh(shape=(2, 2, 2))
        pf, ph, pw = calc.calculate_kgrid_peaks_sharded(
            mesh, kv, n_peaks=2, width_method='lorentzian')
        rf, rh, rw = calc.calculate_kgrid_peaks(kv, n_peaks=2,
                                                width_method='lorentzian')
        np.testing.assert_allclose(pf, rf, atol=1e-6)
        np.testing.assert_allclose(pw, rw, rtol=1e-2, atol=1e-4)

    def test_auto_engine_nonuniform_grid_falls_back_to_direct(self):
        """A tensor-product but NON-uniform 128x128 grid must route to the
        direct engine under engine='auto' (plan_kgrid would reject it),
        not crash with 'kx_vals must be uniformly spaced' (ADVICE r2)."""
        traj = make_random_crystal_trajectory(n_cells_xyz=(2, 2, 1), basis=1,
                                              n_frames=8, dt_ps=0.02, seed=5)
        calc = SEDCalculator(traj, nx=2, ny=2, nz=1)
        n = 128
        c1 = (np.linspace(0, 1, n, dtype=np.float32) ** 2) * 2.0  # quadratic
        c2 = np.linspace(-1, 1, n, dtype=np.float32)              # uniform
        k_vecs = np.stack([np.repeat(c1, n), np.tile(c2, n),
                           np.zeros(n * n, np.float32)], axis=1)
        pf, ph, pw = calc.calculate_kgrid_peaks(k_vecs, n_peaks=1,
                                                engine='auto',
                                                k_grid_shape=(n, n))
        assert pf.shape == (1, n * n)
        # explicit gridded still refuses the non-uniform grid
        with pytest.raises(ValueError, match="uniformly spaced"):
            calc.calculate_kgrid_peaks(k_vecs, n_peaks=1, engine='gridded',
                                       k_grid_shape=(n, n))

    def test_chiral_empty_grid_returns_four_arrays(self):
        """chiral=True on an empty k set keeps the documented 4-tuple
        contract (ADVICE r2)."""
        traj = make_random_crystal_trajectory(n_cells_xyz=(2, 2, 1), basis=1,
                                              n_frames=8, dt_ps=0.02, seed=5)
        calc = SEDCalculator(traj, nx=2, ny=2, nz=1)
        empty_k = np.zeros((0, 3), dtype=np.float32)
        pf, ph, pw, pphase = calc.calculate_kgrid_peaks(empty_k, chiral=True)
        for arr in (pf, ph, pw, pphase):
            assert arr.shape == (1, 0)
        pf, ph, pw = calc.calculate_kgrid_peaks(empty_k)
        assert pf.shape == (1, 0)

    def test_max_freq_and_validation(self):
        traj = make_random_crystal_trajectory(n_cells_xyz=(2, 2, 2), basis=1,
                                              n_frames=16, dt_ps=0.02, seed=1)
        calc = SEDCalculator(traj, nx=2, ny=2, nz=2)
        _, k_vecs, _ = calc.get_k_grid('xy', (-1, 1), (-1, 1), 5, 5)
        nyq = 1.0 / (2 * 0.02)
        pf, _, _ = calc.calculate_kgrid_peaks(k_vecs, max_freq=nyq / 2)
        assert np.all(pf <= nyq / 2 + 1e-6)
        with pytest.raises(ValueError, match="n_peaks"):
            calc.calculate_kgrid_peaks(k_vecs, n_peaks=0)
        with pytest.raises(ValueError, match="summation_mode"):
            calc.calculate_kgrid_peaks(k_vecs, summation_mode='bogus')


class TestHoneycombPhysics:
    """Honeycomb (graphene-like) oracle: 2-atom basis on a non-orthogonal
    cell.  Each out-of-plane band, synthesized with its exact Bloch
    eigenvector, must peak on the analytic two-band dispersion at every
    allowed k; a circularly polarized K-point mode must show chiral phase
    handedness·π/2 — the 2D chiral-phonon geometry (K-point phonons of
    hBN/TMD materials) the 1D chain oracle cannot reach."""

    N, A, NUK = 8, 2.46, 8.0

    def _allowed_kvecs(self):
        b1 = (2 * np.pi / self.A) * np.array([1.0, -1 / np.sqrt(3.0), 0.0])
        b2 = (2 * np.pi / self.A) * np.array([0.0, 2 / np.sqrt(3.0), 0.0])
        mm, nn = np.meshgrid(np.arange(self.N), np.arange(self.N),
                             indexing='ij')
        return ((mm.ravel()[:, None] * b1 + nn.ravel()[:, None] * b2)
                / self.N).astype(np.float32)

    def test_dispersion_endpoints(self):
        from psa_tpu.models import honeycomb_dispersion, honeycomb_K_point
        kpt = honeycomb_K_point(self.A)
        ac, op = honeycomb_dispersion(kpt[0], kpt[1], self.A, self.NUK)
        np.testing.assert_allclose([ac, op], [self.NUK, self.NUK], rtol=1e-12)
        ac0, op0 = honeycomb_dispersion(0.0, 0.0, self.A, self.NUK)
        np.testing.assert_allclose([ac0, op0],
                                   [0.0, self.NUK * np.sqrt(2.0)], atol=1e-12)

    @pytest.mark.parametrize('band', ['acoustic', 'optical'])
    def test_band_peaks_on_analytic_surface(self, band):
        from psa_tpu.models import (honeycomb_dispersion,
                                    honeycomb_structure_factor,
                                    make_honeycomb_trajectory)
        traj = make_honeycomb_trajectory(n_cells=self.N, n_frames=512,
                                         dt_ps=0.01, a=self.A,
                                         nu_K_thz=self.NUK, bands=(band,),
                                         seed=1)
        calc = SEDCalculator(traj, nx=self.N, ny=self.N, nz=1)
        k_vecs = self._allowed_kvecs()
        freqs, inten, _ = calc.calculate_kgrid_browse(k_vecs)
        nu_ac, nu_op = honeycomb_dispersion(k_vecs[:, 0], k_vecs[:, 1],
                                            self.A, self.NUK)
        analytic = nu_ac if band == 'acoustic' else nu_op
        peak = freqs[np.argmax(inten, axis=0)]
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        # The coherent SED weight of a two-sublattice Bloch mode probed at
        # its own k is |1 ± e^{iθ}|² (θ = arg f): the acoustic branch fades
        # where θ → π, the optical where θ → 0 (e.g. exactly zero at Γ —
        # the (1,−1) sublattice sum cancels).  Check only visible modes.
        theta = np.angle(honeycomb_structure_factor(k_vecs[:, 0],
                                                    k_vecs[:, 1], self.A))
        s = +1.0 if band == 'acoustic' else -1.0
        weight = np.abs(1.0 + s * np.exp(1j * theta)) ** 2
        ok = (analytic > df) & (weight > 1.0)
        assert ok.sum() >= 20            # the mask must not hollow the test
        assert np.all(np.abs(peak[ok] - analytic[ok]) <= df + 1e-6), \
            np.max(np.abs(peak[ok] - analytic[ok]))

    @pytest.mark.parametrize('h', [+1, -1])
    def test_K_point_chiral_phase(self, h):
        from psa_tpu.models import make_honeycomb_trajectory, honeycomb_K_point
        traj = make_honeycomb_trajectory(n_cells=self.N, n_frames=512,
                                         dt_ps=0.01, a=self.A,
                                         nu_K_thz=self.NUK, bands=(),
                                         chiral=h, seed=3)
        calc = SEDCalculator(traj, nx=self.N, ny=self.N, nz=1)
        kpt = honeycomb_K_point(self.A).astype(np.float32)[None, :]
        # full path: calculate + chiral phase of the (x, y) pair
        sed = calc.calculate(np.zeros(1), kpt)
        phase = calc.calculate_chiral_phase(sed.sed[:, :, 0], sed.sed[:, :, 1],
                                            angle_range_opt='C')
        fi = int(np.argmin(np.abs(sed.freqs - 0.6 * self.NUK)))
        assert abs(phase[fi, 0] - h * np.pi / 2) < 0.05
        # browse path: chiral_axis='z' → (x, y) component mapping
        freqs, inten, bphase = calc.calculate_kgrid_browse(
            kpt, chiral=True, chiral_axis='z')
        peak_row = int(np.argmax(inten[:, 0]))
        assert abs(bphase[peak_row, 0] - h * np.pi / 2) < 0.05

    def test_incoherent_sees_coherently_cancelled_branch(self):
        """At a θ≈0 mode the optical branch is coherently suppressed
        (weight |1−e^{iθ}|² ≈ 0) — the coherent top peaks are all acoustic,
        while type-resolved (incoherent) SED recovers both branches."""
        from psa_tpu.models import make_honeycomb_trajectory, honeycomb_dispersion
        traj = make_honeycomb_trajectory(n_cells=self.N, n_frames=512,
                                         dt_ps=0.01, a=self.A,
                                         nu_K_thz=self.NUK, seed=1)
        calc = SEDCalculator(traj, nx=self.N, ny=self.N, nz=1)
        b1 = (2 * np.pi / self.A) * np.array([1.0, -1 / np.sqrt(3.0), 0.0])
        kv = (b1 / self.N)[None, :].astype(np.float32)   # θ ≈ 0.006
        nu_ac, nu_op = honeycomb_dispersion(kv[:, 0], kv[:, 1],
                                            self.A, self.NUK)
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        pfc, _, _ = calc.calculate_kgrid_peaks(kv, n_peaks=2)
        pfi, _, _ = calc.calculate_kgrid_peaks(kv, n_peaks=2,
                                               basis_atom_types=[1, 2],
                                               summation_mode='incoherent')
        assert np.all(np.abs(pfc[:, 0] - nu_op[0]) > 5 * df)   # optical absent
        assert np.min(np.abs(pfc[:, 0] - nu_ac[0])) <= df + 1e-6
        assert np.min(np.abs(pfi[:, 0] - nu_op[0])) <= df + 1e-6  # recovered
        assert np.min(np.abs(pfi[:, 0] - nu_ac[0])) <= df + 1e-6


class TestDOS:
    """Vibrational DOS: exact parity vs a float64 NumPy oracle, type
    partitioning, and peak placement on a known single-mode trajectory."""

    def _oracle(self, data):
        spec = np.fft.fft(data.astype(np.float64), axis=0) / data.shape[0]
        return np.sum(np.abs(spec) ** 2, axis=(1, 2))

    def test_matches_numpy_oracle(self, crystal, calc):
        freqs, dos = calc.calculate_dos()
        assert dos.shape == (1, len(freqs))
        full = self._oracle(crystal.velocities)
        expect = full[np.fft.fftfreq(crystal.n_frames, crystal.dt_ps) >= 0]
        np.testing.assert_allclose(dos[0], expect, rtol=1e-5, atol=1e-10)

    def test_type_partition_sums_to_total(self, crystal, calc):
        freqs, total = calc.calculate_dos()
        _, per_type = calc.calculate_dos(basis_atom_types=[1, 2])
        assert per_type.shape[0] == 2
        np.testing.assert_allclose(per_type.sum(axis=0), total[0], rtol=1e-4)

    def test_atom_chunking_invariant(self, crystal, calc):
        _, a = calc.calculate_dos()
        _, b = calc.calculate_dos(atom_chunk_size=3)
        np.testing.assert_allclose(a, b, rtol=1e-5)

    def test_peaks_on_synthesized_mode(self):
        from psa_tpu.models import make_chiral_chain_trajectory
        nu = 5.0
        traj = make_chiral_chain_trajectory(n_cells=32, n_frames=250,
                                            dt_ps=0.02, nu_thz=nu,
                                            mode_index=8, seed=3)
        calc = SEDCalculator(traj, nx=32, ny=1, nz=1)
        freqs, dos = calc.calculate_dos(max_freq=20.0)
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        assert abs(freqs[np.argmax(dos[0])] - nu) <= df + 1e-6

    def test_mass_weighting_scales(self, crystal):
        import dataclasses
        masses = np.full(crystal.n_atoms, 4.0)
        traj_m = dataclasses.replace(crystal, masses=masses)
        base = SEDCalculator(traj_m, nx=3, ny=3, nz=2)
        weighted = SEDCalculator(traj_m, nx=3, ny=3, nz=2, mass_weighted=True)
        _, d0 = base.calculate_dos()
        _, d1 = weighted.calculate_dos()
        np.testing.assert_allclose(d1, 4.0 * d0, rtol=1e-5)


@pytest.mark.slow
class TestFCCPhysics:
    """3D FCC oracle with FULL VECTOR polarizations: branch frequencies from
    the exact NN dynamical matrix, and the SED's per-component amplitudes
    must realize the eigenvector directions (longitudinal vs transverse) —
    the scalar-polarized oracles cannot distinguish a component swap."""

    A, NULX, N = 4.0, 10.0, 6

    def _path_100(self):
        k_mags = 2 * np.pi * np.arange(1, self.N // 2 + 1) / (self.N * self.A)
        kvecs = np.zeros((len(k_mags), 3), dtype=np.float32)
        kvecs[:, 0] = k_mags
        return k_mags, kvecs

    def _traj(self, branches):
        from psa_tpu.models import make_fcc_trajectory
        return make_fcc_trajectory(n_cells=self.N, n_frames=512, dt_ps=0.01,
                                   a=self.A, nu_L_X_thz=self.NULX,
                                   branches=branches, seed=1)

    def _peaks_and_pol(self, traj, kvecs, k_mags):
        calc = SEDCalculator(traj, nx=self.N, ny=self.N, nz=self.N)
        sed = calc.calculate(k_mags, kvecs)
        pos = sed.freqs >= 0
        inten = sed.intensity[pos]
        ridx = np.argmax(inten, axis=0)
        top = sed.freqs[pos][ridx]
        amp2 = np.abs(sed.sed[pos][ridx, np.arange(len(k_mags)), :]) ** 2
        frac = amp2 / amp2.sum(axis=1, keepdims=True)
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        return top, frac, df

    def test_longitudinal_100(self):
        from psa_tpu.models import fcc_dynamical_branches
        k_mags, kvecs = self._path_100()
        top, frac, df = self._peaks_and_pol(self._traj((2,)), kvecs, k_mags)
        nu, _ = fcc_dynamical_branches(kvecs, self.A, self.NULX)
        assert np.all(np.abs(top - nu[:, 2]) <= df + 1e-6)
        assert np.all(frac[:, 0] > 0.95)          # pure-x polarization

    def test_transverse_100(self):
        from psa_tpu.models import fcc_dynamical_branches
        k_mags, kvecs = self._path_100()
        top, frac, df = self._peaks_and_pol(self._traj((0, 1)), kvecs, k_mags)
        nu, _ = fcc_dynamical_branches(kvecs, self.A, self.NULX)
        # T branches are degenerate along [100]
        np.testing.assert_allclose(nu[:, 0], nu[:, 1], rtol=1e-10)
        assert np.all(np.abs(top - nu[:, 0]) <= df + 1e-6)
        assert np.all(frac[:, 0] < 0.05)          # x silent: transverse

    def test_longitudinal_110_polarization(self):
        """Along [110] the L eigenvector is (1,1,0)/√2 — a non-axis-aligned
        polarization the component amplitudes must split evenly."""
        from psa_tpu.models import fcc_dynamical_branches
        k_mags = 2 * np.pi * np.sqrt(2) * np.arange(1, 3) / (self.N * self.A)
        kvecs = np.zeros((2, 3), dtype=np.float32)
        kvecs[:, 0] = kvecs[:, 1] = k_mags / np.sqrt(2)
        top, frac, df = self._peaks_and_pol(self._traj((2,)), kvecs, k_mags)
        nu, _ = fcc_dynamical_branches(kvecs, self.A, self.NULX)
        assert np.all(np.abs(top - nu[:, 2]) <= df + 1e-6)
        np.testing.assert_allclose(frac[:, 0], frac[:, 1], atol=0.05)
        assert np.all(frac[:, 2] < 0.05)


def test_no_scan_env_matches_scan_path(monkeypatch):
    """PSA_TPU_NO_SCAN=1 (fast-compile interactive mode) must produce the
    same browse planes through the per-chunk dispatch path."""
    from psa_tpu.models import make_chain_trajectory
    traj = make_chain_trajectory(n_cells=24, n_frames=64, dt_ps=0.02)
    calc = SEDCalculator(traj, nx=24, ny=1, nz=1)
    _, k_vecs, shape = calc.get_k_grid('xy', (-1, 1), (-1, 1), 8, 8)
    f1, i1, _ = calc.calculate_kgrid_browse(k_vecs, k_chunk_size=16)
    monkeypatch.setenv('PSA_TPU_NO_SCAN', '1')
    f2, i2, _ = calc.calculate_kgrid_browse(k_vecs, k_chunk_size=16)
    np.testing.assert_allclose(f1, f2, atol=0)
    np.testing.assert_allclose(i1, i2, rtol=1e-6)


class TestChiralPeaks:
    """Chiral phase gathered AT the peak bins: a chiral dispersion surface
    at peak-triplet readback cost — oracle-pinned to handedness·π/2."""

    @pytest.mark.parametrize('h', [+1, -1])
    def test_phase_at_peak_tracks_handedness(self, h):
        from psa_tpu.models import make_chiral_chain_trajectory
        traj = make_chiral_chain_trajectory(n_cells=32, n_frames=250,
                                            dt_ps=0.02, nu_thz=5.0,
                                            mode_index=8, handedness=h)
        calc = SEDCalculator(traj, nx=32, ny=1, nz=1)
        k = 2 * np.pi * 8 / (32 * 2.5)
        kv = np.array([[k, 0, 0]], dtype=np.float32)
        pf, ph, pw, pph = calc.calculate_kgrid_peaks(kv, n_peaks=1,
                                                     chiral=True,
                                                     chiral_axis='x')
        df = 1.0 / (traj.n_frames * traj.dt_ps)
        assert abs(pf[0, 0] - 5.0) <= df + 1e-6
        assert abs(pph[0, 0] - h * np.pi / 2) < 0.05

    def test_guards(self):
        from psa_tpu.models import make_chain_trajectory
        traj = make_chain_trajectory(n_cells=8, n_frames=32, dt_ps=0.02)
        calc = SEDCalculator(traj, nx=8, ny=1, nz=1)
        kv = np.zeros((4, 3), dtype=np.float32)
        with pytest.raises(ValueError, match="direct engine"):
            calc.calculate_kgrid_peaks(kv, chiral=True, engine='gridded',
                                       k_grid_shape=(2, 2))
        # non-chiral call still returns the triplet (no phase row)
        out = calc.calculate_kgrid_peaks(kv, n_peaks=1)
        assert len(out) == 3


class TestLorentzianScaleInvariance:
    def test_bright_peaks_do_not_overflow_f32(self):
        """I ~ 1e10 intensities (realistic for 1e5-atom coherent SED) must
        give the same FWHM as O(1) intensities — the fit normalizes by the
        peak height, so the f32 I^2-weighted sums cannot overflow."""
        from psa_tpu.core.calculator import peaks_np
        from psa_tpu.ops import spectral
        import jax.numpy as jnp
        n_f = 64
        freqs = np.linspace(0, 10, n_f).astype(np.float32)
        nu0, gamma = freqs[30], 0.35
        lor = 1.0 / (1.0 + ((freqs - nu0) / gamma) ** 2)
        for scale in (1.0, 1e10, 1e14):
            plane = (scale * lor)[None, :, None].astype(np.float32)
            pf, ph, pw = spectral.peak_reduce(
                jnp.asarray(np.tile(plane, (1, 1, 8))), jnp.asarray(freqs),
                n_peaks=1, exclusion_bins=10, width_method='lorentzian')
            fwhm = float(np.asarray(pw)[0, 0, 0])
            assert np.isfinite(fwhm)
            assert abs(fwhm - 2 * gamma) / (2 * gamma) < 0.05, (scale, fwhm)
            pf_n, _, pw_n = peaks_np(plane[0], freqs, n_peaks=1,
                                     exclusion_bins=10,
                                     width_method='lorentzian')
            np.testing.assert_allclose(fwhm, pw_n[0, 0], rtol=2e-3)


class TestShardedDuplicateIndices:
    def test_duplicated_indices_match_single_chip(self):
        """A duplicated basis index contributes once per occurrence in the
        single-chip gather; the sharded weight vector must count it too."""
        from psa_tpu.parallel import make_mesh
        traj = make_random_crystal_trajectory(n_cells_xyz=(2, 2, 2), basis=2,
                                              n_frames=16, dt_ps=0.02, seed=7)
        calc = SEDCalculator(traj, nx=2, ny=2, nz=2)
        kv = np.outer(np.linspace(0, 1.0, 5), [1, 0, 0]).astype(np.float32)
        idx = [0, 0, 1, 2, 2, 2, 5]
        mesh = make_mesh(shape=(1, 2, 4))
        f_s, i_s, _ = calc.calculate_kgrid_browse_sharded(
            mesh, kv, basis_atom_indices=idx)
        f_1, i_1, _ = calc.calculate_kgrid_browse(kv, basis_atom_indices=idx)
        np.testing.assert_allclose(i_s, i_1, rtol=1e-5, atol=1e-8)
        # duplicated full cover must NOT take the unweighted fast path
        dup_all = list(range(traj.n_atoms - 1)) + [0]
        w, single = calc._group_weights(
            [np.asarray(dup_all)], 'coherent')
        assert w is not None                 # not the all-atoms fast path


class TestWelch:
    """calculate_welch: segment-averaged (Welch/Bartlett) intensity."""

    def _welch_oracle(self, traj, k_vectors, segments, window,
                      group_idx=None):
        """Float64 NumPy segmentation of the reference formula."""
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
        spec = np.fft.fft(s, axis=1) / seg
        return np.mean(np.sum(np.abs(spec) ** 2, axis=-1), axis=0)

    @pytest.fixture(scope='class')
    def k(self):
        return np.outer(np.linspace(0, 1.2, 7), [1, 0, 0]).astype(np.float32)

    @pytest.mark.parametrize("window", ["rect", "hann"])
    @pytest.mark.parametrize("segments", [1, 2, 5])
    def test_oracle_parity(self, crystal, calc, k, segments, window):
        sed = calc.calculate_welch(np.linalg.norm(k, axis=1), k,
                                   segments=segments, window=window)
        oracle = self._welch_oracle(crystal, k, segments, window)
        assert not sed.is_complex
        assert sed.sed.shape == (crystal.n_frames // segments, len(k))
        err = np.max(np.abs(sed.sed - oracle)) / np.max(oracle)
        assert err < 1e-5, err
        np.testing.assert_allclose(
            sed.freqs, np.fft.fftfreq(crystal.n_frames // segments, d=0.02),
            rtol=1e-6)

    def test_single_rect_segment_matches_full_spectrum(self, calc, k):
        """segments=1, window='rect' is exactly the classic estimate."""
        welch = calc.calculate_welch(np.linalg.norm(k, axis=1), k,
                                     segments=1, window='rect')
        full = calc.calculate(np.linalg.norm(k, axis=1), k)
        np.testing.assert_allclose(welch.sed, full.intensity,
                                   rtol=1e-5, atol=1e-10)

    def test_variance_reduction_on_white_noise(self):
        """Averaging S segments shrinks the per-bin scatter ~1/sqrt(S)."""
        traj = make_random_crystal_trajectory(n_cells_xyz=(4, 2, 2), basis=2,
                                              n_frames=128, dt_ps=0.02,
                                              seed=5)
        calc = SEDCalculator(traj, nx=4, ny=2, nz=2)
        k = np.array([[0.7, 0, 0]], dtype=np.float32)
        mags = np.array([0.7], dtype=np.float32)
        s1 = calc.calculate_welch(mags, k, segments=1, window='rect').sed[:, 0]
        s8 = calc.calculate_welch(mags, k, segments=8, window='rect').sed[:, 0]
        rel1 = np.std(s1) / np.mean(s1)
        rel8 = np.std(s8) / np.mean(s8)
        # expected ratio 1/sqrt(8) ~ 0.35; allow statistical slack
        assert rel8 < 0.6 * rel1, (rel1, rel8)

    def test_incoherent_sums_group_intensities(self, crystal, calc, k):
        mags = np.linalg.norm(k, axis=1)
        incoh = calc.calculate_welch(mags, k, segments=2,
                                     basis_atom_types=[1, 2],
                                     summation_mode='incoherent')
        total = np.zeros_like(incoh.sed, dtype=np.float64)
        for t in (1, 2):
            idx = np.flatnonzero(crystal.types == t)
            total += self._welch_oracle(crystal, k, 2, 'hann', group_idx=idx)
        err = np.max(np.abs(incoh.sed - total)) / np.max(total)
        assert err < 1e-5, err

    def test_oversize_group_streams_and_matches(self, crystal, k):
        small = SEDCalculator(crystal, nx=3, ny=3, nz=2,
                              max_device_bytes=1_000)
        big = SEDCalculator(crystal, nx=3, ny=3, nz=2)
        mags = np.linalg.norm(k, axis=1)
        a = small.calculate_welch(mags, k, segments=4)
        b = big.calculate_welch(mags, k, segments=4)
        np.testing.assert_allclose(a.sed, b.sed, rtol=2e-5,
                                   atol=1e-6 * np.max(b.sed))

    def test_k_chunking_invariant(self, calc, k):
        mags = np.linalg.norm(k, axis=1)
        one = calc.calculate_welch(mags, k, segments=2, k_chunk_size=500)
        many = calc.calculate_welch(mags, k, segments=2, k_chunk_size=3)
        np.testing.assert_allclose(one.sed, many.sed, rtol=1e-6)

    def test_metadata_and_validation(self, calc, crystal, k):
        mags = np.linalg.norm(k, axis=1)
        sed = calc.calculate_welch(mags, k, segments=2)
        assert sed.trajectory_metadata == {'welch_segments': 2,
                                           'window': 'hann'}
        with pytest.raises(ValueError, match="segments"):
            calc.calculate_welch(mags, k, segments=0)
        with pytest.raises(ValueError, match="at least 2"):
            calc.calculate_welch(mags, k, segments=crystal.n_frames)
        with pytest.raises(ValueError, match="window"):
            calc.calculate_welch(mags, k, segments=2, window='hamming')
        with pytest.raises(ValueError, match="summation_mode"):
            calc.calculate_welch(mags, k, segments=2, summation_mode='bogus')
