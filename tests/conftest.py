"""Test configuration: force an 8-device virtual CPU platform.

Tests must run without TPU hardware and must be able to exercise multi-device
sharding, so we pin JAX to CPU with 8 virtual devices BEFORE jax initializes
(the standard way to test mesh code without a pod).
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'  # override: the shell may pin a TPU platform
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

# A sitecustomize may have registered (and pinned) a TPU platform before this
# module ran; jax.config wins over the env var in that case.
import jax
jax.config.update('jax_platforms', 'cpu')

import matplotlib
matplotlib.use('Agg')  # headless plotting

import numpy as np
import pytest

from psa_tpu.core.trajectory import Trajectory, make_box_arrays


@pytest.fixture
def small_trajectory() -> Trajectory:
    """Deterministic random trajectory: 16 frames, 24 atoms, 2 types."""
    rng = np.random.default_rng(42)
    n_frames, n_atoms = 16, 24
    box = np.diag([12.0, 12.0, 12.0]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(
        positions=rng.uniform(0, 12, (n_frames, n_atoms, 3)).astype(np.float32),
        velocities=rng.normal(0, 1, (n_frames, n_atoms, 3)).astype(np.float32),
        types=np.array([1, 2] * (n_atoms // 2), dtype=np.int32),
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)


def reference_sed_oracle(traj: Trajectory, k_vectors: np.ndarray,
                         group_idx: np.ndarray = None,
                         use_displacements: bool = False) -> np.ndarray:
    """Float64 NumPy oracle of the reference SED formula
    (reference sed_calculator.py:58-84) — the parity ground truth."""
    if group_idx is None:
        group_idx = np.arange(traj.n_atoms)
    mean_pos = traj.positions.astype(np.float64).mean(axis=0)
    if use_displacements:
        data = traj.positions[:, group_idx, :].astype(np.float64) - mean_pos[group_idx][None]
    else:
        data = traj.velocities[:, group_idx, :].astype(np.float64)
    phase = np.exp(1j * (k_vectors.astype(np.float64) @ mean_pos[group_idx].T))  # (K, N)
    s = np.einsum('tac,ka->tkc', data, phase)
    return np.fft.fft(s, axis=0) / traj.n_frames
