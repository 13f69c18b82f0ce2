"""Synthetic lattice models with known phonon physics (fixtures/benchmarks)."""
from .lattices import (
    diatomic_chain_branches, make_chain_trajectory, make_chiral_chain_trajectory,
    make_diatomic_chain_trajectory, make_random_crystal_trajectory,
    make_square_lattice_trajectory, monatomic_chain_modes,
    square_lattice_dispersion,
)

__all__ = ["make_chain_trajectory", "make_chiral_chain_trajectory",
           "make_diatomic_chain_trajectory",
           "make_random_crystal_trajectory", "make_square_lattice_trajectory",
           "monatomic_chain_modes", "diatomic_chain_branches",
           "square_lattice_dispersion"]
