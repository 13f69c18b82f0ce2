"""Live head-to-head against the actual reference implementation.

Imports the reference package from /root/reference (read-only) and compares
its NumPy pipeline output against psa_tpu on identical inputs.  Tolerances
account for the reference's own float32 noise floor (~|k·r̄|·2⁻²⁴ in phase;
our engine computes compensated phases, so the difference IS the reference's
rounding, not ours).

Skipped automatically when the reference tree is not present.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

REF_SRC = Path("/root/reference/src")
if not REF_SRC.exists():
    pytest.skip("reference tree not available", allow_module_level=True)

sys.path.insert(0, str(REF_SRC))

from psa.core.sed_calculator import SEDCalculator as RefCalculator  # noqa: E402
from psa.core.trajectory import Trajectory as RefTrajectory          # noqa: E402
from psa.utils.helpers import parse_direction as ref_parse_direction  # noqa: E402

from psa_tpu import SEDCalculator, parse_direction                    # noqa: E402
from psa_tpu.models import make_random_crystal_trajectory             # noqa: E402


@pytest.fixture(scope='module')
def traj():
    # modest box: keeps the reference's own f32 phase noise ~1e-6-level so the
    # comparison tolerance stays tight
    return make_random_crystal_trajectory(n_cells_xyz=(3, 3, 2), basis=2,
                                          n_frames=32, dt_ps=0.02, a=5.43, seed=21)


@pytest.fixture(scope='module')
def ref_traj(traj):
    return RefTrajectory(positions=traj.positions, velocities=traj.velocities,
                         types=traj.types, timesteps=traj.timesteps,
                         box_matrix=traj.box_matrix, box_lengths=traj.box_lengths,
                         box_tilts=traj.box_tilts, dt_ps=traj.dt_ps)


@pytest.fixture(scope='module')
def calcs(traj, ref_traj):
    ours = SEDCalculator(traj, nx=3, ny=3, nz=2)
    ref = RefCalculator(ref_traj, nx=3, ny=3, nz=2)
    return ours, ref


def rel(got, want):
    scale = np.max(np.abs(want))
    return np.max(np.abs(got - want)) / scale if scale else np.max(np.abs(got))


class TestDirectionParity:
    @pytest.mark.parametrize("spec", [
        'x', 'y', 'z', 'xy', '110', '111', 45.0, [1, 2, 3], '1,1,0',
        {'h': 2, 'k': 1, 'l': 0}, {'angle': 30},
    ])
    def test_parse_direction_identical(self, spec):
        np.testing.assert_allclose(parse_direction(spec), ref_parse_direction(spec),
                                   atol=1e-7)


class TestLatticeParity:
    def test_reciprocal_vectors(self, calcs):
        ours, ref = calcs
        np.testing.assert_allclose(ours.b1, ref.b1, rtol=1e-6)
        np.testing.assert_allclose(ours.b2, ref.b2, rtol=1e-6)
        np.testing.assert_allclose(ours.b3, ref.b3, rtol=1e-6)

    @pytest.mark.parametrize("kwargs", [
        dict(direction_spec='x', bz_coverage=2.0, n_k=25),
        dict(direction_spec=[1, 1, 0], bz_coverage=1.0, n_k=10, lat_param=5.43),
        dict(direction_spec='z', bz_coverage=0.5, n_k=1),
    ])
    def test_k_path_identical(self, calcs, kwargs):
        ours, ref = calcs
        m1, v1 = ours.get_k_path(**kwargs)
        m2, v2 = ref.get_k_path(**kwargs)
        np.testing.assert_allclose(m1, m2, atol=1e-6)
        np.testing.assert_allclose(v1, v2, atol=1e-6)

    @pytest.mark.parametrize("plane", ['xy', 'yz', 'zx'])
    def test_k_grid_identical(self, calcs, plane):
        ours, ref = calcs
        _, v1, s1 = ours.get_k_grid(plane, (-1, 1), (-2, 2), 4, 5, k_fixed_val=0.3)
        _, v2, s2 = ref.get_k_grid(plane, (-1, 1), (-2, 2), 4, 5, k_fixed_val=0.3)
        assert s1 == s2
        np.testing.assert_allclose(v1, v2, atol=1e-6)


class TestSEDParity:
    def test_coherent_all_atoms(self, calcs):
        ours, ref = calcs
        k_m, k_v = ours.get_k_path('x', bz_coverage=1.0, n_k=11)
        a = ours.calculate(k_m, k_v)
        b = ref.calculate(k_m, k_v)
        assert a.is_complex == b.is_complex
        assert a.sed.shape == b.sed.shape
        np.testing.assert_allclose(a.freqs, b.freqs, atol=1e-9)
        assert rel(a.sed, b.sed) < 2e-5     # the reference's own f32 noise

    def test_incoherent_type_groups(self, calcs):
        ours, ref = calcs
        k_m, k_v = ours.get_k_path('y', bz_coverage=1.0, n_k=7)
        a = ours.calculate(k_m, k_v, basis_atom_types=[1, 2],
                           summation_mode='incoherent')
        b = ref.calculate(k_m, k_v, basis_atom_types=[1, 2],
                          summation_mode='incoherent')
        assert a.sed.shape == b.sed.shape
        assert not a.is_complex and not b.is_complex
        assert rel(a.sed, b.sed) < 5e-5

    def test_index_basis(self, calcs, traj):
        ours, ref = calcs
        k_m, k_v = ours.get_k_path('z', bz_coverage=1.0, n_k=6)
        idx = list(range(0, traj.n_atoms, 3))
        a = ours.calculate(k_m, k_v, basis_atom_indices=idx)
        b = ref.calculate(k_m, k_v, basis_atom_indices=idx)
        assert rel(a.sed, b.sed) < 2e-5

    def test_displacement_mode(self, traj, ref_traj):
        ours = SEDCalculator(traj, nx=3, ny=3, nz=2, use_displacements=True)
        ref = RefCalculator(ref_traj, nx=3, ny=3, nz=2, use_displacements=True)
        k_m, k_v = ours.get_k_path('x', bz_coverage=1.0, n_k=6)
        a = ours.calculate(k_m, k_v)
        b = ref.calculate(k_m, k_v)
        # displacement subtraction in f32 is the reference's dominant noise here
        assert rel(a.sed, b.sed) < 2e-4

    def test_intensity_property(self, calcs):
        ours, ref = calcs
        k_m, k_v = ours.get_k_path('x', bz_coverage=1.0, n_k=5)
        a = ours.calculate(k_m, k_v)
        b = ref.calculate(k_m, k_v)
        assert rel(a.intensity, b.intensity) < 5e-5


class TestChiralParity:
    def test_option_c(self, calcs):
        ours, ref = calcs
        rng = np.random.default_rng(3)
        z1 = (rng.normal(size=(20, 9)) + 1j * rng.normal(size=(20, 9))).astype(np.complex64)
        z2 = (rng.normal(size=(20, 9)) + 1j * rng.normal(size=(20, 9))).astype(np.complex64)
        a = ours.calculate_chiral_phase(z1, z2, 'C')
        b = ref.calculate_chiral_phase(z1, z2, 'C')
        np.testing.assert_allclose(a, b, atol=1e-5)

    @pytest.mark.parametrize("opt", ['A', 'B'])
    def test_options_ab(self, calcs, opt):
        ours, ref = calcs
        rng = np.random.default_rng(4)
        z1 = (rng.normal(size=(8, 5)) + 1j * rng.normal(size=(8, 5))).astype(np.complex64)
        z2 = (rng.normal(size=(8, 5)) + 1j * rng.normal(size=(8, 5))).astype(np.complex64)
        a = ours.calculate_chiral_phase(z1, z2, opt)
        b = ref.calculate_chiral_phase(z1, z2, opt)
        # compare in cos/sin space (arccos/arcsin pole sensitivity)
        if opt == 'A':
            np.testing.assert_allclose(np.cos(a), np.cos(b), atol=1e-5)
        else:
            np.testing.assert_allclose(np.sin(a), np.sin(b), atol=1e-5)


class TestISEDParity:
    def test_dump_outputs_match(self, calcs, tmp_path):
        ours, ref = calcs
        kwargs = dict(k_dir_spec='x', k_target=0.5, w_target=5.0,
                      char_len_k_path=5.43, nk_on_path=10, bz_cov_ised=1.0,
                      rescale_factor=2.0, n_recon_frames=4)
        ours.ised(dump_filepath=str(tmp_path / "ours.dump"), **kwargs)
        ref.ised(dump_filepath=str(tmp_path / "ref.dump"), **kwargs)
        from psa_tpu.io.lammps import read_lammps_dump
        p1, _, t1, _, b1 = read_lammps_dump(tmp_path / "ours.dump", unwrap=False)
        p2, _, t2, _, b2 = read_lammps_dump(tmp_path / "ref.dump", unwrap=False)
        assert p1.shape == p2.shape
        np.testing.assert_array_equal(t1, t2)
        np.testing.assert_allclose(b1, b2, atol=1e-6)
        # positions: mean pos dominates; wiggles differ at the reference's f32
        # noise level scaled by the rescale factor
        np.testing.assert_allclose(p1, p2, atol=5e-3)
