"""Radial distribution function: brute-force oracle + crystal physics.

g(r) must match a float64 all-images pair histogram (incl. a triclinic
cell), sit at 1 for an ideal gas, and put coordination shells where the
lattice says (simple cubic: 6 at a₀; CsCl cross-RDF: 8 at √3/2·a₀).
"""
import numpy as np
import pytest

from psa_tpu import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays


def _traj(pos, box, types=None, dt_ps=0.05):
    n_t, n_a, _ = pos.shape
    box = np.asarray(box, dtype=np.float32)
    lengths, tilts = make_box_arrays(box)
    if types is None:
        types = np.ones(n_a, np.int32)
    return Trajectory(pos.astype(np.float32),
                      np.zeros_like(pos, dtype=np.float32),
                      np.asarray(types, np.int32),
                      np.arange(n_t, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)


def rdf_oracle(pos, box, r_max, n_bins):
    """All-origins float64 histogram via explicit 27-image minimum
    distances (same-group, self pairs excluded)."""
    box = np.asarray(box, dtype=np.float64)
    n_t, n_a, _ = pos.shape
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], dtype=np.float64) @ box.T
    counts = np.zeros(n_bins)
    edges = np.linspace(0, r_max, n_bins + 1)
    for t in range(n_t):
        d = pos[t, :, None, :].astype(np.float64) - pos[t, None, :, :]
        imgs = d[:, :, None, :] + shifts[None, None, :, :]
        r = np.sqrt((imgs ** 2).sum(-1)).min(axis=-1)
        r[np.arange(n_a), np.arange(n_a)] = np.inf
        counts += np.histogram(r, bins=edges)[0]
    vol = abs(np.linalg.det(box))
    shell = 4 / 3 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    return counts / (n_t * n_a * (n_a - 1) * shell / vol)


class TestOracle:
    @pytest.mark.slow
    def test_matches_f64_all_images_orthorhombic(self):
        rng = np.random.default_rng(0)
        n_t, n_a = 4, 40
        box = np.diag([9.0, 11.0, 10.0])
        pos = rng.uniform(0, 9, (n_t, n_a, 3)) * np.array([1, 11 / 9, 10 / 9])
        traj = _traj(pos, box)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        r, g = calc.calculate_rdf(r_max=4.0, n_bins=40)
        want = rdf_oracle(pos, box, 4.0, 40)
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(r, np.linspace(0.05, 3.95, 40), atol=1e-6)

    def test_matches_f64_all_images_triclinic(self):
        rng = np.random.default_rng(1)
        n_t, n_a = 3, 30
        box = np.array([[10.0, 2.0, 1.0],   # LAMMPS upper-triangular, tilted
                        [0.0, 9.0, 1.5],
                        [0.0, 0.0, 8.0]])
        frac = rng.uniform(0, 1, (n_t, n_a, 3))
        pos = np.einsum('ij,taj->tai', box, frac)
        traj = _traj(pos, box)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        r, g = calc.calculate_rdf(r_max=3.5, n_bins=35)
        want = rdf_oracle(pos, box, 3.5, 35)
        np.testing.assert_allclose(g, want, rtol=1e-4, atol=1e-5)

    @pytest.mark.slow
    def test_overlapping_cross_basis_matches_same_group(self):
        """g_AB with B ≡ A must equal the same-group g(r): self pairs are
        dropped by global id AND the normalization subtracts |A ∩ B|
        (regression: it was (N−1)/N low)."""
        rng = np.random.default_rng(6)
        pos = rng.uniform(0, 10, (3, 30, 3))
        traj = _traj(pos, np.diag([10.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, want = calc.calculate_rdf(r_max=4.0, n_bins=20)
        _, got = calc.calculate_rdf(r_max=4.0, n_bins=20,
                                    basis_atom_types=[1],
                                    basis_atom_types_b=[1])
        np.testing.assert_allclose(got, want, rtol=1e-6)

    @pytest.mark.slow
    def test_mesh_sharded_matches_single_chip(self):
        """g(r) over the 8-device virtual mesh (A shards over all axes,
        one psum) must reproduce the single-chip histogram bin-for-bin,
        incl. the cross-RDF path."""
        from psa_tpu.parallel import make_mesh
        rng = np.random.default_rng(4)
        pos = rng.uniform(0, 12, (3, 37, 3))
        types = np.array([1] * 20 + [2] * 17, np.int32)
        traj = _traj(pos, np.diag([12.0] * 3), types=types)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        mesh = make_mesh(shape=(2, 2, 2))
        _, want = calc.calculate_rdf(r_max=5.0, n_bins=25)
        _, got = calc.calculate_rdf(r_max=5.0, n_bins=25, mesh=mesh,
                                    atom_block=8)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        _, want_ab = calc.calculate_rdf(r_max=5.0, n_bins=25,
                                        basis_atom_types=[1],
                                        basis_atom_types_b=[2])
        _, got_ab = calc.calculate_rdf(r_max=5.0, n_bins=25,
                                       basis_atom_types=[1],
                                       basis_atom_types_b=[2], mesh=mesh,
                                       atom_block=8)
        np.testing.assert_allclose(got_ab, want_ab, rtol=1e-5, atol=1e-6)

    def test_atom_blocking_invariance(self):
        rng = np.random.default_rng(2)
        pos = rng.uniform(0, 12, (2, 50, 3))
        traj = _traj(pos, np.diag([12.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, g1 = calc.calculate_rdf(r_max=5.0, n_bins=25)
        _, g2 = calc.calculate_rdf(r_max=5.0, n_bins=25, atom_block=16)
        np.testing.assert_allclose(g1, g2, rtol=1e-5, atol=1e-6)


class TestCells:
    """Linked-cell path: bin-for-bin identical to the brute sweep."""

    def test_cells_matches_brute_unwrapped_positions(self):
        """Fine grid (6³ cells) on UNWRAPPED positions (several images
        outside the box) — the cells path must wrap before bucketing."""
        rng = np.random.default_rng(10)
        pos = rng.uniform(-24, 36, (3, 300, 3))     # spans ~5 images
        traj = _traj(pos, np.diag([12.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, want = calc.calculate_rdf(r_max=2.0, n_bins=20, method='brute')
        _, got = calc.calculate_rdf(r_max=2.0, n_bins=20, method='cells')
        assert calc._last_rdf_method == 'cells'
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cells_matches_brute_triclinic(self):
        rng = np.random.default_rng(11)
        box = np.array([[10.0, 2.0, 1.0],
                        [0.0, 9.0, 1.5],
                        [0.0, 0.0, 8.0]])
        frac = rng.uniform(0, 1, (2, 200, 3))
        pos = np.einsum('ij,taj->tai', box, frac)
        traj = _traj(pos, box)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, want = calc.calculate_rdf(r_max=1.5, n_bins=15, method='brute')
        _, got = calc.calculate_rdf(r_max=1.5, n_bins=15, method='cells')
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cells_tiny_grid_wrap_dedup(self):
        """r_max ≈ half box → 2 cells per dim: the wrapped 27-stencil
        collapses onto duplicates, which the table dedups — forced cells
        must still equal brute (and the f64 oracle)."""
        rng = np.random.default_rng(12)
        pos = rng.uniform(0, 12, (3, 60, 3))
        traj = _traj(pos, np.diag([12.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, want = calc.calculate_rdf(r_max=5.5, n_bins=22, method='brute')
        _, got = calc.calculate_rdf(r_max=5.5, n_bins=22, method='cells')
        np.testing.assert_allclose(got, want, rtol=1e-6)
        oracle = rdf_oracle(pos, np.diag([12.0] * 3), 5.5, 22)
        np.testing.assert_allclose(got, oracle, rtol=1e-4, atol=1e-5)

    def test_cells_cross_group(self):
        rng = np.random.default_rng(13)
        pos = rng.uniform(0, 14, (2, 250, 3))
        types = np.array([1] * 150 + [2] * 100, np.int32)
        traj = _traj(pos, np.diag([14.0] * 3), types=types)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kw = dict(r_max=2.0, n_bins=20, basis_atom_types=[1],
                  basis_atom_types_b=[2])
        _, want = calc.calculate_rdf(method='brute', **kw)
        _, got = calc.calculate_rdf(method='cells', **kw)
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cell_block_invariance(self):
        rng = np.random.default_rng(14)
        pos = rng.uniform(0, 12, (2, 150, 3))
        traj = _traj(pos, np.diag([12.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, g1 = calc.calculate_rdf(r_max=2.0, n_bins=20, method='cells',
                                   cell_block=16)
        _, g2 = calc.calculate_rdf(r_max=2.0, n_bins=20, method='cells',
                                   cell_block=128)
        np.testing.assert_allclose(g1, g2, rtol=1e-6)

    def test_auto_prefers_brute_when_cells_lose(self):
        """Small N, wide r_max: padded cell pairs exceed the brute count —
        'auto' must take (and record) the brute path."""
        rng = np.random.default_rng(15)
        pos = rng.uniform(0, 10, (2, 40, 3))
        traj = _traj(pos, np.diag([10.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        calc.calculate_rdf(r_max=4.0, n_bins=20)       # method='auto'
        assert calc._last_rdf_method == 'brute'

    def test_auto_picks_cells_for_short_cutoff_large_n(self):
        """Dense enough system + short r_max: auto must route to cells
        and match brute."""
        rng = np.random.default_rng(16)
        pos = rng.uniform(0, 24, (1, 3000, 3))
        traj = _traj(pos, np.diag([24.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        _, want = calc.calculate_rdf(r_max=2.0, n_bins=20, method='brute')
        _, got = calc.calculate_rdf(r_max=2.0, n_bins=20)  # auto
        assert calc._last_rdf_method == 'cells'
        np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_cells_with_mesh_raises(self):
        import pytest
        from psa_tpu.parallel import make_mesh
        rng = np.random.default_rng(17)
        pos = rng.uniform(0, 10, (1, 20, 3))
        traj = _traj(pos, np.diag([10.0] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        with pytest.raises(ValueError, match="single-device"):
            calc.calculate_rdf(r_max=2.0, method='cells',
                               mesh=make_mesh(shape=(2, 2, 2)))


class TestPhysics:
    @pytest.mark.slow
    def test_ideal_gas_is_flat_one(self):
        rng = np.random.default_rng(3)
        n_t, n_a, L = 8, 500, 15.0
        pos = rng.uniform(0, L, (n_t, n_a, 3))
        traj = _traj(pos, np.diag([L] * 3))
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        r, g = calc.calculate_rdf(n_bins=30)
        # skip the first bins (few ideal pairs at tiny r → noisy)
        np.testing.assert_allclose(g[5:], 1.0, atol=0.12)
        assert abs(g[5:].mean() - 1.0) < 0.02

    @pytest.mark.slow
    def test_simple_cubic_shells_and_coordination(self):
        a0, n_c = 2.0, 5
        grid = np.stack(np.meshgrid(*([np.arange(n_c) * a0] * 3),
                                    indexing='ij'), -1).reshape(-1, 3)
        pos = grid[None]
        traj = _traj(pos, np.diag([n_c * a0] * 3))
        calc = SEDCalculator(traj, nx=n_c, ny=n_c, nz=n_c)
        r, g = calc.calculate_rdf(r_max=4.5, n_bins=90)
        vol = (n_c * a0) ** 3
        rho = grid.shape[0] / vol
        dr = r[1] - r[0]
        coord = 4 * np.pi * rho * np.cumsum(g * r.astype(np.float64) ** 2) * dr
        # first shell: 6 neighbors at a0; second: 12 at √2·a0
        i1 = np.searchsorted(r, (1.0 + np.sqrt(2)) / 2 * a0)
        i2 = np.searchsorted(r, (np.sqrt(2) + np.sqrt(3)) / 2 * a0)
        np.testing.assert_allclose(coord[i1], 6.0, rtol=0.02)
        np.testing.assert_allclose(coord[i2], 18.0, rtol=0.02)
        # nothing below the nearest-neighbor distance
        assert g[r < 0.9 * a0].max() == 0.0

    def test_cscl_cross_rdf(self):
        """CsCl: B atoms at cube centers — g_AB's first shell is 8
        neighbors at √3/2·a₀, and g_AB = 0 below it."""
        a0, n_c = 2.0, 4
        grid = np.stack(np.meshgrid(*([np.arange(n_c) * a0] * 3),
                                    indexing='ij'), -1).reshape(-1, 3)
        pos = np.concatenate([grid, grid + a0 / 2], axis=0)[None]
        types = np.array([1] * len(grid) + [2] * len(grid), np.int32)
        traj = _traj(pos, np.diag([n_c * a0] * 3), types=types)
        calc = SEDCalculator(traj, nx=n_c, ny=n_c, nz=n_c)
        r, g_ab = calc.calculate_rdf(r_max=3.0, n_bins=60,
                                     basis_atom_types=[1],
                                     basis_atom_types_b=[2])
        d1 = np.sqrt(3) / 2 * a0
        assert g_ab[r < 0.95 * d1].max() == 0.0
        vol = (n_c * a0) ** 3
        rho_b = len(grid) / vol
        dr = r[1] - r[0]
        coord = 4 * np.pi * rho_b * np.cumsum(
            g_ab * r.astype(np.float64) ** 2) * dr
        i1 = np.searchsorted(r, 1.1 * d1)
        np.testing.assert_allclose(coord[i1], 8.0, rtol=0.02)
