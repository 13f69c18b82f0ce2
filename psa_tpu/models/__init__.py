"""Synthetic lattice models with known phonon physics (fixtures/benchmarks)."""
from .lattices import (
    make_chain_trajectory, make_random_crystal_trajectory, monatomic_chain_modes,
)

__all__ = ["make_chain_trajectory", "make_random_crystal_trajectory",
           "monatomic_chain_modes"]
