"""Trajectory container for molecular-dynamics data.

Host-resident (NumPy) container with the same field set and invariants as the
reference data layer (reference: src/psa/core/trajectory.py:8-45).  Device
placement is the engine's job, not the container's: a Trajectory may describe
hundreds of GB at pod scale, so arrays live on host (or memory-mapped on disk)
and are streamed to TPU HBM chunk-wise by the SED engine.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np


@dataclass
class Trajectory:
    """MD trajectory: per-frame positions/velocities plus box metadata.

    Attributes:
        positions:  (n_frames, n_atoms, 3) float32 — unwrapped coordinates (Å).
        velocities: (n_frames, n_atoms, 3) float32 (Å/ps or native MD units).
        types:      (n_atoms,) integer atom types.
        timesteps:  (n_frames,) frame times (ps).
        box_matrix: (3, 3) simulation cell matrix (rows = cell vectors).
        box_lengths:(3,) diagonal lengths.
        box_tilts:  (3,) tilt factors (xy, xz, yz).
        dt_ps:      frame spacing in picoseconds.
        masses:     optional (n_atoms,) per-atom masses. The reference engine is
            NOT mass-weighted (see SURVEY.md §0); this field exists so the
            opt-in mass-weighted SED extension has somewhere to read from.
    """
    positions: np.ndarray
    velocities: np.ndarray
    types: np.ndarray
    timesteps: np.ndarray
    box_matrix: np.ndarray
    box_lengths: np.ndarray
    box_tilts: np.ndarray
    dt_ps: float
    masses: Optional[np.ndarray] = None

    def __post_init__(self):
        if self.positions.ndim != 3 or self.positions.shape[2] != 3:
            raise ValueError("Positions must be 3D (frames, atoms, xyz) and last dimension must be 3.")
        if self.velocities.ndim != 3 or self.velocities.shape[2] != 3:
            raise ValueError("Velocities must be 3D (frames, atoms, xyz) and last dimension must be 3.")
        if self.types.ndim != 1:
            raise ValueError("Types must be 1D")
        if self.timesteps.ndim != 1:
            raise ValueError("Timesteps must be 1D")
        if not (self.positions.shape[0] == self.velocities.shape[0] == len(self.timesteps)):
            raise ValueError("Frame count mismatch: positions, velocities, timesteps.")
        if not (self.positions.shape[1] == self.velocities.shape[1] == len(self.types)):
            raise ValueError("Atom count mismatch: positions, velocities, types.")
        if self.box_matrix.shape != (3, 3):
            raise ValueError(f"Box matrix must be 3x3, got {self.box_matrix.shape}")
        if self.box_lengths.shape != (3,):
            raise ValueError(f"Box lengths must be a 3-element array, got {self.box_lengths.shape}")
        if self.box_tilts.shape != (3,):
            raise ValueError(f"Box tilts must be a 3-element array, got {self.box_tilts.shape}")
        if self.masses is not None and self.masses.shape != (self.positions.shape[1],):
            raise ValueError(
                f"Masses must have shape ({self.positions.shape[1]},), got {self.masses.shape}")

    @property
    def n_frames(self) -> int:
        return len(self.timesteps)

    @property
    def n_atoms(self) -> int:
        return len(self.types)

    def mean_positions(self) -> np.ndarray:
        """Time-averaged atomic positions r̄ (float32 accumulation, matching the
        reference engine's np.mean(..., dtype=float32); sed_calculator.py:205)."""
        return np.mean(self.positions, axis=0, dtype=np.float32)


def make_box_arrays(box_matrix: np.ndarray):
    """Derive (box_lengths, box_tilts) from a 3x3 cell matrix using the LAMMPS
    convention: lengths = diagonal, tilts = (xy, xz, yz) = H[0,1], H[0,2], H[1,2]."""
    box_matrix = np.asarray(box_matrix, dtype=np.float32)
    lengths = np.array([box_matrix[0, 0], box_matrix[1, 1], box_matrix[2, 2]], dtype=np.float32)
    tilts = np.array([box_matrix[0, 1], box_matrix[0, 2], box_matrix[1, 2]], dtype=np.float32)
    return lengths, tilts
