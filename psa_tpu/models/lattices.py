"""Synthetic MD trajectory generators with known phonon physics.

The reference ships no test fixtures that exercise the engine; its examples
require external LAMMPS data.  These generators fill that gap: closed-form
lattice-dynamics trajectories whose SED has an analytically known dispersion,
used by the golden parity tests, the benchmark harness, and the examples.

Physics: a 1D monatomic chain with nearest-neighbor springs has
    ω(k) = ω_max · |sin(k a / 2)|,   ω_max = 2 √(κ/m)
so synthesizing atomic motion from a set of chain normal modes produces a
trajectory whose SED must peak exactly on that curve — a checkable oracle.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from ..core.trajectory import Trajectory, make_box_arrays


def monatomic_chain_modes(n_cells: int, a: float = 2.5, omega_max_thz: float = 10.0,
                          n_modes: Optional[int] = None, seed: int = 0
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Normal modes of a 1D chain: (k values, ω(k) in THz·2π rad/ps, amplitudes)."""
    rng = np.random.default_rng(seed)
    n_modes = n_modes or max(1, n_cells // 2)
    mode_idx = rng.choice(np.arange(1, n_cells // 2 + 1), size=min(n_modes, n_cells // 2),
                          replace=False)
    k_vals = 2 * np.pi * mode_idx / (n_cells * a)                 # 2π/Å
    omega = omega_max_thz * np.abs(np.sin(k_vals * a / 2.0))      # THz
    amps = rng.uniform(0.01, 0.05, size=k_vals.shape)
    return k_vals, omega, amps


def make_chain_trajectory(n_cells: int = 64, n_frames: int = 256, dt_ps: float = 0.05,
                          a: float = 2.5, omega_max_thz: float = 10.0,
                          n_modes: Optional[int] = None, seed: int = 0,
                          noise: float = 0.0) -> Trajectory:
    """1D monatomic chain trajectory built from superposed normal modes.

    Atoms sit on x_i = i·a along x; displacement and velocity follow
    u_i(t) = Σ_m A_m cos(k_m x_i − 2π ν_m t + φ_m).  The SED of this
    trajectory peaks on ω(k) = ω_max |sin(ka/2)|.
    """
    rng = np.random.default_rng(seed + 1)
    k_vals, nu_thz, amps = monatomic_chain_modes(n_cells, a, omega_max_thz, n_modes, seed)
    phases = rng.uniform(0, 2 * np.pi, size=k_vals.shape)

    x0 = np.arange(n_cells, dtype=np.float64) * a                 # (N,)
    t = np.arange(n_frames, dtype=np.float64) * dt_ps             # (T,)
    # phase[t, atom, mode]
    arg = (k_vals[None, None, :] * x0[None, :, None]
           - 2 * np.pi * nu_thz[None, None, :] * t[:, None, None]
           + phases[None, None, :])
    disp = np.sum(amps[None, None, :] * np.cos(arg), axis=-1)     # (T, N)
    vel = np.sum(amps[None, None, :] * 2 * np.pi * nu_thz[None, None, :]
                 * np.sin(arg), axis=-1)                          # du/dt

    positions = np.zeros((n_frames, n_cells, 3), dtype=np.float32)
    velocities = np.zeros((n_frames, n_cells, 3), dtype=np.float32)
    positions[:, :, 0] = (x0[None, :] + disp).astype(np.float32)
    velocities[:, :, 0] = vel.astype(np.float32)
    if noise > 0:
        positions += rng.normal(0, noise, positions.shape).astype(np.float32)
        velocities += rng.normal(0, noise, velocities.shape).astype(np.float32)

    box = np.diag([n_cells * a, 10.0, 10.0]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(
        positions=positions, velocities=velocities,
        types=np.ones(n_cells, dtype=np.int32),
        timesteps=(t * 0 + np.arange(n_frames)).astype(np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)


def make_random_crystal_trajectory(n_cells_xyz: Tuple[int, int, int] = (4, 4, 4),
                                   basis: int = 2, n_frames: int = 64,
                                   dt_ps: float = 0.02, a: float = 5.43,
                                   seed: int = 0, n_types: int = 2) -> Trajectory:
    """Randomized 3D crystal trajectory (thermal-like motion, no exact physics).

    Used for parity and stress tests at realistic shapes: atoms on a cubic
    supercell lattice with ``basis`` atoms per cell, random velocities, and
    small random walks around the lattice sites.
    """
    rng = np.random.default_rng(seed)
    nx, ny, nz = n_cells_xyz
    grid = np.stack(np.meshgrid(np.arange(nx), np.arange(ny), np.arange(nz),
                                indexing='ij'), axis=-1).reshape(-1, 3)
    offsets = rng.uniform(0, 0.5, size=(basis, 3))
    sites = (grid[:, None, :] + offsets[None, :, :]).reshape(-1, 3) * a
    n_atoms = sites.shape[0]

    positions = (sites[None, :, :]
                 + rng.normal(0, 0.05, size=(n_frames, n_atoms, 3))).astype(np.float32)
    velocities = rng.normal(0, 1.0, size=(n_frames, n_atoms, 3)).astype(np.float32)
    types = (np.tile(np.arange(basis), n_atoms // basis) % n_types + 1).astype(np.int32)

    box = np.diag([nx * a, ny * a, nz * a]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(
        positions=positions, velocities=velocities, types=types,
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)


def diatomic_chain_branches(k: np.ndarray, kappa: float, m1: float, m2: float):
    """Analytic diatomic-chain dispersion ω±(k) (rad/ps) and eigenvector ratios.

    For the 1D chain with alternating masses m1, m2, spring κ, spacing a/2:
        ω±² = κ(1/m1 + 1/m2) ± κ√((1/m1+1/m2)² − 4 sin²(ka/2)/(m1·m2))
    Returns (omega_acoustic, omega_optical, ratio_ac, ratio_op) where ratio is
    the m2-sublattice amplitude per unit m1-sublattice amplitude:
        u2/u1 = 2κ cos(ka/2) / (2κ − m2 ω²)
    """
    s = 1.0 / m1 + 1.0 / m2
    ka2 = k / 2.0  # k·(a=1)/2; caller scales k by the cell length
    disc = np.sqrt(np.maximum(s * s - 4.0 * np.sin(ka2) ** 2 / (m1 * m2), 0.0))
    w_ac = np.sqrt(np.maximum(kappa * (s - disc), 0.0))
    w_op = np.sqrt(kappa * (s + disc))

    def ratio(w):
        denom = 2.0 * kappa - m2 * w ** 2
        denom = np.where(np.abs(denom) < 1e-12, 1e-12, denom)
        return 2.0 * kappa * np.cos(ka2) / denom

    return w_ac, w_op, ratio(w_ac), ratio(w_op)


def make_diatomic_chain_trajectory(n_cells: int = 32, n_frames: int = 512,
                                   dt_ps: float = 0.02, a: float = 5.0,
                                   kappa: float = 800.0, m1: float = 1.0,
                                   m2: float = 3.0, amp: float = 0.02,
                                   seed: int = 0) -> Trajectory:
    """Diatomic 1D chain: two atoms per cell (types 1 and 2), acoustic and
    optical branches synthesized with their exact eigenvectors.

    ω in rad/ps; SED frequencies peak at ω/(2π) THz.  The optical branch
    carries opposite-phase motion of the two sublattices — type-resolved
    (incoherent) SED separates the branch weights.
    """
    rng = np.random.default_rng(seed)
    n_atoms = 2 * n_cells
    x1 = np.arange(n_cells, dtype=np.float64) * a          # type-1 sites
    x2 = x1 + a / 2.0                                      # type-2 sites

    mode_idx = np.arange(1, n_cells // 2 + 1)
    k_vals = 2 * np.pi * mode_idx / (n_cells * a)
    w_ac, w_op, r_ac, r_op = diatomic_chain_branches(k_vals * a, kappa, m1, m2)

    t = np.arange(n_frames, dtype=np.float64) * dt_ps
    disp1 = np.zeros((n_frames, n_cells))
    disp2 = np.zeros((n_frames, n_cells))
    vel1 = np.zeros((n_frames, n_cells))
    vel2 = np.zeros((n_frames, n_cells))
    for branch, (w, r) in enumerate(((w_ac, r_ac), (w_op, r_op))):
        phases = rng.uniform(0, 2 * np.pi, size=k_vals.shape)
        for km, wm, rm, ph in zip(k_vals, w, r, phases):
            if wm <= 0:
                continue
            norm = max(1.0, abs(rm))
            a1, a2 = amp / norm, amp * rm / norm
            arg1 = km * x1[None, :] - wm * t[:, None] + ph
            arg2 = km * x2[None, :] - wm * t[:, None] + ph
            disp1 += a1 * np.cos(arg1)
            disp2 += a2 * np.cos(arg2)
            vel1 += a1 * wm * np.sin(arg1)
            vel2 += a2 * wm * np.sin(arg2)

    positions = np.zeros((n_frames, n_atoms, 3), dtype=np.float32)
    velocities = np.zeros((n_frames, n_atoms, 3), dtype=np.float32)
    positions[:, 0::2, 0] = (x1[None, :] + disp1).astype(np.float32)
    positions[:, 1::2, 0] = (x2[None, :] + disp2).astype(np.float32)
    velocities[:, 0::2, 0] = vel1.astype(np.float32)
    velocities[:, 1::2, 0] = vel2.astype(np.float32)

    types = np.empty(n_atoms, dtype=np.int32)
    types[0::2] = 1
    types[1::2] = 2
    masses = np.where(types == 1, m1, m2).astype(np.float64)

    box = np.diag([n_cells * a, 10.0, 10.0]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(positions=positions, velocities=velocities, types=types,
                      timesteps=np.arange(n_frames, dtype=np.float32),
                      box_matrix=box, box_lengths=lengths, box_tilts=tilts,
                      dt_ps=dt_ps, masses=masses)


def make_chiral_chain_trajectory(n_cells: int = 64, n_frames: int = 512,
                                 dt_ps: float = 0.02, a: float = 2.5,
                                 nu_thz: float = 5.0, mode_index: int = 8,
                                 handedness: int = +1, amp: float = 0.02,
                                 seed: int = 0) -> Trajectory:
    """1D chain carrying ONE circularly polarized transverse phonon mode.

    Atoms on x_i = i·a move on circles in the y–z plane:

        u_y(t) = A cos(k x − 2π ν t + φ)
        u_z(t) = −h · A sin(k x − 2π ν t + φ),    h = handedness ∈ {+1, −1}

    so u_z lags (h=+1) or leads (h=−1) u_y by exactly π/2.  The chiral phase
    Δφ = ∠Φ_y − ∠Φ_z of the SED at the synthesized (k, ν) is therefore
    **h · π/2 exactly** — an analytic oracle for the sign convention and
    quadrant folding of ``calculate_chiral_phase`` (reference
    sed_calculator.py:344-350) and for the browse path's
    ``chiral_axis='x' → (y, z)`` component mapping (psa_gui.py:976-982).

    Args:
        mode_index: chain mode m; k = 2π·m / (n_cells·a).
        handedness: +1 (u_z lags) or −1 (u_z leads).
    """
    if handedness not in (+1, -1):
        raise ValueError(f"handedness must be +1 or -1, got {handedness}")
    rng = np.random.default_rng(seed)
    k = 2.0 * np.pi * mode_index / (n_cells * a)
    phi = rng.uniform(0, 2 * np.pi)
    x0 = np.arange(n_cells, dtype=np.float64) * a
    t = np.arange(n_frames, dtype=np.float64) * dt_ps
    arg = k * x0[None, :] - 2.0 * np.pi * nu_thz * t[:, None] + phi  # (T, N)

    w = 2.0 * np.pi * nu_thz
    positions = np.zeros((n_frames, n_cells, 3), dtype=np.float32)
    velocities = np.zeros((n_frames, n_cells, 3), dtype=np.float32)
    positions[:, :, 0] = x0[None, :].astype(np.float32)
    positions[:, :, 1] = (amp * np.cos(arg)).astype(np.float32)
    positions[:, :, 2] = (-handedness * amp * np.sin(arg)).astype(np.float32)
    velocities[:, :, 1] = (amp * w * np.sin(arg)).astype(np.float32)
    velocities[:, :, 2] = (handedness * amp * w * np.cos(arg)).astype(np.float32)

    box = np.diag([n_cells * a, 10.0, 10.0]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(
        positions=positions, velocities=velocities,
        types=np.ones(n_cells, dtype=np.int32),
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)


def square_lattice_dispersion(kx: np.ndarray, ky: np.ndarray, a: float = 2.5,
                              nu_max_thz: float = 10.0) -> np.ndarray:
    """Analytic dispersion surface of the nearest-neighbor square lattice:

        ν(k) = ν_max · √( sin²(kx a/2) + sin²(ky a/2) ) / √2      (THz)

    ν_max is the zone-corner (M-point) frequency.
    """
    return nu_max_thz * np.sqrt(
        (np.sin(kx * a / 2.0) ** 2 + np.sin(ky * a / 2.0) ** 2) / 2.0)


def make_square_lattice_trajectory(n_cells: int = 16, n_frames: int = 256,
                                   dt_ps: float = 0.01, a: float = 2.5,
                                   nu_max_thz: float = 10.0, seed: int = 0
                                   ) -> Trajectory:
    """2D square monatomic lattice (z-polarized modes) with the analytic
    dispersion of :func:`square_lattice_dispersion` — the grid-engine
    analog of :func:`make_chain_trajectory`: the k-GRID SED of this
    trajectory must peak on ν(kx, ky) at every reciprocal-lattice-allowed
    grid point.

    Atoms sit on (i·a, j·a, 0); each allowed mode k = 2π(m, n)/(N a)
    contributes z displacement u(t) = A cos(k·r − 2π ν t + φ).
    """
    rng = np.random.default_rng(seed + 1)
    n_atoms = n_cells * n_cells
    ii, jj = np.meshgrid(np.arange(n_cells), np.arange(n_cells), indexing='ij')
    r = np.stack([ii.ravel() * a, jj.ravel() * a], axis=1).astype(np.float64)

    # all allowed modes except Γ (no restoring force there)
    ms, ns = np.meshgrid(np.arange(n_cells), np.arange(n_cells), indexing='ij')
    sel = ~((ms == 0) & (ns == 0))
    kxy = (2.0 * np.pi / (n_cells * a)) * np.stack(
        [ms[sel].ravel(), ns[sel].ravel()], axis=1)             # (M, 2)
    nu = square_lattice_dispersion(kxy[:, 0], kxy[:, 1], a, nu_max_thz)
    amps = rng.uniform(0.5, 1.0, size=len(kxy)) * 0.01
    phases = rng.uniform(0, 2 * np.pi, size=len(kxy))

    t = np.arange(n_frames, dtype=np.float64) * dt_ps
    arg = (r @ kxy.T)[None, :, :] - 2 * np.pi * nu[None, None, :] * t[:, None, None] \
        + phases[None, None, :]
    disp_z = np.sum(amps[None, None, :] * np.cos(arg), axis=-1)   # (T, N)
    vel_z = np.sum(amps[None, None, :] * 2 * np.pi * nu[None, None, :]
                   * np.sin(arg), axis=-1)

    positions = np.zeros((n_frames, n_atoms, 3), dtype=np.float32)
    velocities = np.zeros((n_frames, n_atoms, 3), dtype=np.float32)
    positions[:, :, 0] = r[None, :, 0]
    positions[:, :, 1] = r[None, :, 1]
    positions[:, :, 2] = disp_z.astype(np.float32)
    velocities[:, :, 2] = vel_z.astype(np.float32)

    box = np.diag([n_cells * a, n_cells * a, 10.0]).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(
        positions=positions, velocities=velocities,
        types=np.ones(n_atoms, dtype=np.int32),
        timesteps=np.arange(n_frames, dtype=np.float32),
        box_matrix=box, box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)
