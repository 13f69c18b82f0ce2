"""Shared Si-like synthetic workload for the TPU campaign scripts."""
import numpy as np

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays


def make_si_calculator(n_atoms: int, n_t: int, dt_ps: float = 0.01,
                       seed: int = 0):
    """(calc, side) — SEDCalculator over a diamond-cubic slab with thermal
    velocities (the bench workload)."""
    rng = np.random.default_rng(seed)
    a0 = 5.43
    side = int(np.ceil((n_atoms / 8) ** (1 / 3)))
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                     axis=-1).reshape(-1, 3)
    basis = np.array([[0, 0, 0], [.25, .25, .25], [.5, .5, 0],
                      [.75, .75, .25], [.5, 0, .5], [.75, .25, .75],
                      [0, .5, .5], [.25, .75, .75]])
    sites = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3)
             * a0)[:n_atoms]
    vel = rng.standard_normal((n_t, n_atoms, 3), dtype=np.float32)
    positions = np.broadcast_to(sites.astype(np.float32),
                                (n_t, n_atoms, 3))
    box = np.diag([sites.max() + a0] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    traj = Trajectory(positions, vel, np.ones(n_atoms, dtype=np.int32),
                      np.arange(n_t, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)
    return SEDCalculator(traj, nx=side, ny=side, nz=side), side
