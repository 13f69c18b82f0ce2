"""Trajectory container validation (mirrors reference tests/test_trajectory.py)."""
import numpy as np
import pytest

from psa_tpu.core.trajectory import Trajectory, make_box_arrays


def make_valid_kwargs(n_frames=4, n_atoms=6):
    rng = np.random.default_rng(0)
    box = np.diag([10.0, 11.0, 12.0]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return dict(
        positions=rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32),
        velocities=rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32),
        types=np.ones(n_atoms, dtype=np.int32),
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)


def test_valid_construction():
    traj = Trajectory(**make_valid_kwargs())
    assert traj.n_frames == 4
    assert traj.n_atoms == 6


@pytest.mark.parametrize("field,bad_value,match", [
    ("positions", np.zeros((4, 6)), "Positions must be 3D"),
    ("positions", np.zeros((4, 6, 2)), "Positions must be 3D"),
    ("velocities", np.zeros((4, 6)), "Velocities must be 3D"),
    ("velocities", np.zeros((4, 6, 4)), "Velocities must be 3D"),
    ("types", np.ones((6, 1)), "Types must be 1D"),
    ("timesteps", np.zeros((4, 1)), "Timesteps must be 1D"),
    ("timesteps", np.arange(3, dtype=np.float32), "Frame count mismatch"),
    ("types", np.ones(5, dtype=np.int32), "Atom count mismatch"),
    ("box_matrix", np.eye(2), "Box matrix must be 3x3"),
    ("box_lengths", np.ones(2), "Box lengths"),
    ("box_tilts", np.ones(4), "Box tilts"),
])
def test_invalid_shapes_raise(field, bad_value, match):
    kwargs = make_valid_kwargs()
    kwargs[field] = bad_value
    with pytest.raises(ValueError, match=match):
        Trajectory(**kwargs)


def test_masses_validation():
    kwargs = make_valid_kwargs()
    kwargs['masses'] = np.ones(5)
    with pytest.raises(ValueError, match="Masses"):
        Trajectory(**kwargs)
    kwargs['masses'] = np.ones(6)
    assert Trajectory(**kwargs).masses.shape == (6,)


def test_mean_positions_float32_accumulation():
    traj = Trajectory(**make_valid_kwargs())
    expected = np.mean(traj.positions, axis=0, dtype=np.float32)
    np.testing.assert_allclose(traj.mean_positions(), expected, atol=0)
