"""I/O layer: native parser, LAMMPS round-trips, loader caching, OUTCAR."""
import numpy as np
import pytest

from psa_tpu.io import native
from psa_tpu.io.lammps import read_lammps_dump, unwrap_positions, read_vasp_outcar
from psa_tpu.io.loader import TrajectoryLoader
from psa_tpu.io.writer import TrajectoryWriter, out_to_qdump
from psa_tpu.core.sed import SED
from psa_tpu.models import make_chain_trajectory


class TestNativeParser:
    def test_available_and_correct(self):
        text = b"1.5 -2e3 0.001 +4.25e-2 700\n-0.0 1e-30 3.14159"
        got = native.parse_doubles(text, 8)
        expect = np.fromstring(text.decode(), dtype=np.float64, sep=' ')
        np.testing.assert_allclose(got, expect, rtol=1e-14)

    def test_malformed_raises(self):
        with pytest.raises(ValueError, match="Malformed|Expected"):
            native.parse_doubles(b"1.0 abc 2.0", 3)

    def test_count_mismatch_raises(self):
        with pytest.raises(ValueError, match="Expected"):
            native.parse_doubles(b"1 2 3", 5)

    def test_large_random_roundtrip(self):
        rng = np.random.default_rng(1)
        vals = np.concatenate([rng.normal(scale=10.0 ** float(rng.integers(-8, 8)), size=200)
                               for _ in range(5)])
        text = " ".join(repr(float(v)) for v in vals)
        got = native.parse_doubles(text.encode(), vals.size)
        np.testing.assert_allclose(got, vals, rtol=1e-12)


class TestQdumpRoundtrip:
    def test_orthogonal(self, tmp_path):
        rng = np.random.default_rng(0)
        pos = rng.uniform(0, 10, (3, 5, 3)).astype(np.float32)
        types = np.array([1, 2, 1, 2, 1])
        box = np.diag([10., 11., 12.]).astype(np.float32)
        path = tmp_path / "t.dump"
        out_to_qdump(str(path), pos, types, box)
        rpos, rvel, rtypes, steps, rbox = read_lammps_dump(path, unwrap=False)
        np.testing.assert_allclose(rpos, pos, atol=1e-5)
        np.testing.assert_array_equal(rtypes, types)
        np.testing.assert_allclose(rbox, box, atol=1e-6)
        assert np.all(rvel == 0)

    def test_triclinic(self, tmp_path):
        rng = np.random.default_rng(1)
        pos = rng.uniform(0, 8, (2, 4, 3)).astype(np.float32)
        box = np.array([[10., 1.5, 0.5], [0., 11., 2.0], [0., 0., 12.]],
                       dtype=np.float32)
        path = tmp_path / "tri.dump"
        out_to_qdump(str(path), pos, np.ones(4), box)
        text = path.read_text()
        assert "xy xz yz pp pp pp" in text
        _, _, _, _, rbox = read_lammps_dump(path, unwrap=False)
        np.testing.assert_allclose(rbox, box, atol=1e-5)


class TestTriclinicScaled:
    """Scaled (xs/ys/zs) coordinates and unwrapping must use the cell matrix
    in the column-vector orientation: r = H @ s, never s @ H."""

    def test_scaled_columns_unscale_through_transpose(self, tmp_path):
        H = np.array([[10., 1.5, 0.5], [0., 11., 2.0], [0., 0., 12.]],
                     dtype=np.float64)
        rng = np.random.default_rng(7)
        frac = rng.uniform(0, 1, (2, 6, 3))
        cart_true = frac @ H.T                       # r = H s, row-vector form
        body_frames = []
        for f in range(2):
            rows = [f"{i+1} 1 {frac[f,i,0]:.10f} {frac[f,i,1]:.10f} {frac[f,i,2]:.10f}"
                    for i in range(6)]
            body_frames.append(
                "ITEM: TIMESTEP\n%d\nITEM: NUMBER OF ATOMS\n6\n"
                "ITEM: BOX BOUNDS xy xz yz pp pp pp\n"
                "%f %f 1.5\n%f %f 0.5\n0.0 12.0 2.0\n"
                "ITEM: ATOMS id type xs ys zs\n%s\n"
                % (f, min(0., 1.5, .5, 2.) , 10. + max(0., 1.5, .5, 2.),
                   min(0., 2.), 11. + max(0., 2.), "\n".join(rows)))
        path = tmp_path / "scaled.dump"
        path.write_text("".join(body_frames))
        rpos, _, _, _, rbox = read_lammps_dump(path, unwrap=False)
        np.testing.assert_allclose(rbox, H.astype(np.float32), atol=1e-5)
        np.testing.assert_allclose(rpos, cart_true.astype(np.float32),
                                   rtol=0, atol=1e-4)

    def test_triclinic_unwrap_roundtrip(self):
        """Wrap a smooth triclinic walk into the cell, unwrap, recover it."""
        H = np.array([[10., 1.5, 0.5], [0., 11., 2.0], [0., 0., 12.]],
                     dtype=np.float64)
        n_t, n_a = 24, 5
        rng = np.random.default_rng(3)
        frac0 = rng.uniform(0, 1, (n_a, 3))
        dfrac = rng.uniform(-0.12, 0.12, (n_a, 3))     # < 1/2 cell per step
        frac_true = frac0[None] + dfrac[None] * np.arange(n_t)[:, None, None]
        cart_true = frac_true @ H.T
        wrapped = (frac_true % 1.0) @ H.T              # wrapped in triclinic cell
        un = unwrap_positions(wrapped.astype(np.float32), H.astype(np.float32))
        # unwrap pins frame 0 to its wrapped image; compare displacements
        np.testing.assert_allclose(un - un[:1], (cart_true - cart_true[:1]),
                                   rtol=0, atol=2e-3)


class TestPerFrameBoxes:
    """NPT-style dumps: scaled coordinates must unscale through each frame's
    OWN cell, in every reader (streaming, bulk, mmap)."""

    def _write_npt_scaled(self, tmp_path, n_t=3, n_a=5):
        rng = np.random.default_rng(11)
        frac = rng.uniform(0, 1, (n_t, n_a, 3))
        boxes = np.stack([np.diag([10. + f, 11. + 2 * f, 12. - f])
                          for f in range(n_t)])            # cell grows per frame
        cart_true = np.einsum('tij,taj->tai', boxes, frac)
        path = tmp_path / "npt.dump"
        with open(path, "w") as f:
            for t in range(n_t):
                f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_a}\n")
                f.write("ITEM: BOX BOUNDS pp pp pp\n")
                for d in range(3):
                    f.write(f"0 {boxes[t, d, d]}\n")
                f.write("ITEM: ATOMS id type xs ys zs\n")
                for a in range(n_a):
                    f.write(f"{a+1} 1 " + " ".join(
                        f"{v:.10f}" for v in frac[t, a]) + "\n")
        return path, cart_true.astype(np.float32)

    def test_streaming_and_bulk_use_each_frames_cell(self, tmp_path, monkeypatch):
        from psa_tpu.io import lammps as L
        path, cart_true = self._write_npt_scaled(tmp_path)
        if native.bulk_dump_available():
            monkeypatch.setenv('PSA_BULK_PARSER', '1')
            pos_bulk, *_ = read_lammps_dump(path, unwrap=False)
            np.testing.assert_allclose(pos_bulk, cart_true, rtol=0, atol=1e-4)
        monkeypatch.setattr(L, '_read_dump_bulk', lambda *a, **k: None)
        pos_stream, *_ = read_lammps_dump(path, unwrap=False)
        np.testing.assert_allclose(pos_stream, cart_true, rtol=0, atol=1e-4)

    def test_mmap_source_uses_each_frames_cell(self, tmp_path):
        from psa_tpu.io.lammps import MmapDumpFrames
        if not native.bulk_dump_available():
            pytest.skip("native parallel parser unavailable")
        path, cart_true = self._write_npt_scaled(tmp_path)
        src = MmapDumpFrames(path)
        try:
            pos, _ = src.frames(1, 3)
            np.testing.assert_allclose(pos, cart_true[1:3], rtol=0, atol=1e-4)
            np.testing.assert_array_equal(src.timesteps, [0, 1, 2])
        finally:
            src.close()


class TestVaryingAtomCounts:
    """Dumps whose per-frame atom count differs from frame 0 must error (or
    fall back to the erroring streaming reader) — never silently truncate."""

    def _write_growing(self, tmp_path):
        path = tmp_path / "grow.dump"
        with open(path, "w") as f:
            for t, n_a in enumerate([3, 3, 5]):     # frame 2 grows
                f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{n_a}\n")
                f.write("ITEM: BOX BOUNDS pp pp pp\n0 10\n0 10\n0 10\n")
                f.write("ITEM: ATOMS id type x y z\n")
                for a in range(n_a):
                    f.write(f"{a+1} 1 {a}.0 {a}.5 {t}.0\n")
        return path

    def test_growing_frame_raises(self, tmp_path, monkeypatch):
        monkeypatch.setenv('PSA_BULK_PARSER', '1')
        path = self._write_growing(tmp_path)
        with pytest.raises(ValueError, match="atoms"):
            read_lammps_dump(path, unwrap=False)

    def test_mmap_source_rejects_at_construction(self, tmp_path):
        from psa_tpu.io.lammps import MmapDumpFrames
        if not native.bulk_dump_available():
            pytest.skip("native parallel parser unavailable")
        path = self._write_growing(tmp_path)
        with pytest.raises(ValueError, match="atom counts differ"):
            MmapDumpFrames(path)


class TestUnwrap:
    def test_wrapped_crossing_recovered(self):
        box = np.diag([10., 10., 10.]).astype(np.float32)
        # atom moves +0.4/frame along x, crossing the boundary at 10
        true_x = 9.0 + 0.4 * np.arange(6)
        wrapped = true_x % 10.0
        pos = np.zeros((6, 1, 3), dtype=np.float32)
        pos[:, 0, 0] = wrapped
        un = unwrap_positions(pos, box)
        np.testing.assert_allclose(un[:, 0, 0], true_x, atol=1e-5)


class TestLoaderCache:
    def test_cache_writes_and_reads(self, tmp_path):
        traj = make_chain_trajectory(n_cells=8, n_frames=10, dt_ps=0.01)
        dump = tmp_path / "c.dump"
        out_to_qdump(str(dump), traj.positions, traj.types, traj.box_matrix)
        t1 = TrajectoryLoader(str(dump), dt=0.01).load()
        # sidecars exist (reference layout, loader.py:48-79)
        for part in ('positions', 'velocities', 'types', 'box_matrix',
                     'mean_positions', 'displacements'):
            assert (tmp_path / f"c.{part}.npy").exists(), part
        t2 = TrajectoryLoader(str(dump), dt=0.01).load()
        np.testing.assert_allclose(t1.positions, t2.positions, atol=0)

    def test_bad_format_rejected(self, tmp_path):
        (tmp_path / "x.dump").write_text("data")
        with pytest.raises(ValueError, match="Unsupported file format"):
            TrajectoryLoader(str(tmp_path / "x.dump"), file_format='xyz')

    def test_missing_file(self):
        with pytest.raises(FileNotFoundError):
            TrajectoryLoader("/nonexistent/path.dump")


class TestOutcar:
    def test_minimal_outcar(self, tmp_path):
        outcar = tmp_path / "md.OUTCAR"
        lines = ["header\n",
                 "   ions per type =    2   1\n",
                 "  number of ions     NIONS =      3\n",
                 " direct lattice vectors                 reciprocal\n",
                 "  5.0 0.0 0.0  0.2 0.0 0.0\n",
                 "  0.0 5.0 0.0  0.0 0.2 0.0\n",
                 "  0.0 0.0 5.0  0.0 0.0 0.2\n"]
        for frame in range(2):
            lines.append(" POSITION                 TOTAL-FORCE (eV/Angst)\n")
            lines.append(" -----\n")
            for a in range(3):
                lines.append(f"  {1.0*a+frame*0.1:.4f} {2.0*a:.4f} {0.5*a:.4f}  0 0 0\n")
        outcar.write_text("".join(lines))
        pos, vel, types, steps, box = read_vasp_outcar(outcar)
        assert pos.shape == (2, 3, 3)
        np.testing.assert_array_equal(types, [1, 1, 2])
        np.testing.assert_allclose(box, np.diag([5., 5., 5.]), atol=1e-6)

    def test_realistic_outcar_layout(self, tmp_path):
        """Real OUTCARs delimit POSITION blocks with long dashed lines and
        print the lattice many times; malformed blocks are skipped with the
        good frames kept."""
        outcar = tmp_path / "real.OUTCAR"
        dash = " " + "-" * 83 + "\n"
        lines = ["  vasp.6.3.0 ...\n",
                 "   ions per type =               2   2\n",
                 "   number of dos ... number of ions     NIONS =      4\n",
                 " direct lattice vectors                    reciprocal lattice vectors\n",
                 "     4.0 0.0 0.0   0.25 0.0 0.0\n",
                 "     0.0 4.0 0.0   0.0 0.25 0.0\n",
                 "     0.0 0.0 8.0   0.0 0.0 0.125\n",
                 # lattice printed AGAIN (electronic step) before the MD blocks
                 " direct lattice vectors                    reciprocal lattice vectors\n",
                 "     4.1 0.0 0.0   0.244 0.0 0.0\n",
                 "     0.0 4.1 0.0   0.0 0.244 0.0\n",
                 "     0.0 0.0 8.2   0.0 0.0 0.122\n"]
        rng = np.random.default_rng(0)
        good = []
        for frame in range(3):
            lines.append(" POSITION                                       TOTAL-FORCE (eV/Angst)\n")
            lines.append(dash)
            pos = rng.uniform(0, 4, (4, 3))
            good.append(pos)
            for a in range(4):
                lines.append(f"     {pos[a,0]:.5f} {pos[a,1]:.5f} {pos[a,2]:.5f}"
                             f"        0.01 -0.02 0.03\n")
            lines.append(dash)
            lines.append("  total drift: 0.0 0.0 0.0\n")
        # a truncated block (2 of 4 rows) must be skipped, not crash
        lines.append(" POSITION                                       TOTAL-FORCE (eV/Angst)\n")
        lines.append(dash)
        lines.append("     1.0 1.0 1.0   0 0 0\n")
        lines.append("     2.0 2.0 2.0   0 0 0\n")
        lines.append(dash)
        outcar.write_text("".join(lines))
        pos, vel, types, steps, box = read_vasp_outcar(outcar)
        assert pos.shape == (3, 4, 3)           # truncated block dropped
        np.testing.assert_allclose(pos, np.stack(good), atol=1e-4)
        np.testing.assert_array_equal(types, [1, 1, 2, 2])
        # the LAST lattice before the first position block wins
        np.testing.assert_allclose(box, np.diag([4.1, 4.1, 8.2]), atol=1e-6)
        assert np.all(vel == 0)

    def test_outcar_via_loader_autodetect(self, tmp_path):
        # reuse the same OUTCAR through TrajectoryLoader format detection
        self.test_minimal_outcar(tmp_path)  # writes md.OUTCAR
        # clear cache sidecars so the parser path runs
        traj = TrajectoryLoader(str(tmp_path / "md.OUTCAR"), dt=0.01).load()
        assert traj.n_frames == 2 and traj.n_atoms == 3


class TestTrajectoryWriter:
    def test_all_writers(self, tmp_path):
        traj = make_chain_trajectory(n_cells=4, n_frames=6, dt_ps=0.01)
        w = TrajectoryWriter(tmp_path)
        sed = SED(np.ones((4, 3, 3), np.complex64), np.zeros(4), np.zeros(3),
                  np.zeros((3, 3)), phase=np.ones((4, 3), np.float32))
        w.save_sed_data(sed)
        assert (tmp_path / "sed_data.npz").exists()
        assert (tmp_path / "sed_data.phase.npz").exists()
        w.save_trajectory_data(traj)
        assert (tmp_path / "trajectory_data.npz").exists()
        w.save_config({'a': {'b': 1}})
        assert (tmp_path / "config.yaml").exists()
        w.save_analysis_results({'metric': 1.0})
        assert (tmp_path / "analysis_results.json").exists()
        w.save_log("hello")
        assert (tmp_path / "analysis.log").read_text() == "hello"


class TestMmapLoading:
    def test_mmap_cache_load(self, tmp_path):
        traj = make_chain_trajectory(n_cells=8, n_frames=10, dt_ps=0.01)
        dump = tmp_path / "m.dump"
        out_to_qdump(str(dump), traj.positions, traj.types, traj.box_matrix)
        TrajectoryLoader(str(dump), dt=0.01).load()          # builds the cache
        t = TrajectoryLoader(str(dump), dt=0.01, mmap=True).load()
        assert isinstance(t.positions, np.memmap)
        # engine works on memory-mapped arrays
        from psa_tpu.core.calculator import SEDCalculator
        calc = SEDCalculator(t, nx=8, ny=1, nz=1)
        k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=4)
        sed = calc.calculate(k_mags, k_vecs)
        assert np.all(np.isfinite(sed.intensity))


class TestMassColumn:
    def test_mass_column_loaded(self, tmp_path):
        dump = tmp_path / "wm.dump"
        with open(dump, "w") as f:
            for t in range(2):
                f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n3\n")
                f.write("ITEM: BOX BOUNDS pp pp pp\n0 10\n0 10\n0 10\n")
                f.write("ITEM: ATOMS id type mass x y z vx vy vz\n")
                for a in range(3):
                    f.write(f"{a+1} 1 {28.09*(a+1):.3f} {a}.0 0.0 0.0 0.1 0.0 0.0\n")
        traj = TrajectoryLoader(str(dump), dt=0.01).load()
        assert traj.masses is not None
        np.testing.assert_allclose(traj.masses, [28.09, 56.18, 84.27], atol=1e-3)
        # mass-weighted engine accepts it end to end
        from psa_tpu.core.calculator import SEDCalculator
        calc = SEDCalculator(traj, 1, 1, 1, mass_weighted=True)
        k_mags, k_vecs = calc.get_k_path('x', 0.5, 3, lat_param=10.0)
        sed = calc.calculate(k_mags, k_vecs)
        assert np.all(np.isfinite(sed.intensity))


class TestBulkDumpParser:
    """Native parallel whole-file parser vs the streaming per-frame reader."""

    def _write_dump(self, tmp_path, n_frames=5, n_atoms=17, vel=True, seed=3):
        rng = np.random.default_rng(seed)
        path = tmp_path / "bulk.dump"
        with open(path, "w") as f:
            for t in range(n_frames):
                f.write(f"ITEM: TIMESTEP\n{t * 10}\nITEM: NUMBER OF ATOMS\n{n_atoms}\n")
                f.write("ITEM: BOX BOUNDS pp pp pp\n0 12\n0 13\n0 14\n")
                cols = "id type x y z" + (" vx vy vz" if vel else "")
                f.write(f"ITEM: ATOMS {cols}\n")
                order = rng.permutation(n_atoms)      # shuffled ids
                for a in order:
                    row = [a + 1, (a % 2) + 1] + list(rng.uniform(0, 12, 3))
                    if vel:
                        row += list(rng.normal(0, 1, 3))
                    f.write(" ".join(f"{v:.6f}" if isinstance(v, float) else str(v)
                                     for v in row) + "\n")
        return path

    def test_bulk_matches_streaming(self, tmp_path, monkeypatch):
        from psa_tpu.io import lammps as L
        monkeypatch.setenv('PSA_BULK_PARSER', '1')   # gate opens on >=4 cores
        path = self._write_dump(tmp_path)
        if not native.bulk_dump_available():
            pytest.skip("native parallel parser unavailable")
        bulk = read_lammps_dump(path, unwrap=True, with_masses=True)
        monkeypatch.setattr(L, '_read_dump_bulk', lambda *a, **k: None)
        stream = read_lammps_dump(path, unwrap=True, with_masses=True)
        for b, s in zip(bulk, stream):
            if b is None:
                assert s is None
            else:
                np.testing.assert_allclose(b, s, atol=0)

    def test_bulk_no_velocities(self, tmp_path, monkeypatch):
        monkeypatch.setenv('PSA_BULK_PARSER', '1')
        path = self._write_dump(tmp_path, vel=False)
        pos, vel_arr, types, steps, box = read_lammps_dump(path, unwrap=False)
        assert np.all(vel_arr == 0)
        np.testing.assert_array_equal(steps, [0, 10, 20, 30, 40])

    def test_malformed_frame_falls_back(self, tmp_path, monkeypatch):
        """A truncated body must not crash the bulk path — the streaming
        reader takes over and reports the real error."""
        monkeypatch.setenv('PSA_BULK_PARSER', '1')
        path = self._write_dump(tmp_path, n_frames=3)
        text = path.read_text().splitlines(keepends=True)
        path.write_text("".join(text[:-2]))    # drop 2 atom rows of last frame
        with pytest.raises(ValueError):
            read_lammps_dump(path)


class TestExtxyz:
    def _write(self, tmp_path, with_vel=True, with_lattice=True, plain=False):
        rng = np.random.default_rng(5)
        n_t, n_a = 3, 4
        pos = rng.uniform(0, 8, (n_t, n_a, 3))
        vel = rng.normal(0, 1, (n_t, n_a, 3))
        species = ['Si', 'O', 'Si', 'O']
        path = tmp_path / "t.extxyz"
        with open(path, "w") as f:
            for t in range(n_t):
                f.write(f"{n_a}\n")
                if plain:
                    f.write(f"frame {t}\n")
                else:
                    parts = []
                    if with_lattice:
                        parts.append('Lattice="8 0 0 0 9 0 0 0 10"')
                    props = "Properties=species:S:1:pos:R:3"
                    if with_vel:
                        props += ":vel:R:3"
                    parts.append(props)
                    f.write(" ".join(parts) + f" Time={t}\n")
                for a in range(n_a):
                    row = [species[a]] + [f"{v:.8f}" for v in pos[t, a]]
                    if with_vel and not plain:
                        row += [f"{v:.8f}" for v in vel[t, a]]
                    f.write(" ".join(row) + "\n")
        return path, pos, vel

    def test_full_extxyz(self, tmp_path):
        from psa_tpu.io.lammps import read_extxyz
        path, pos, vel = self._write(tmp_path)
        rpos, rvel, types, steps, box = read_extxyz(path)
        np.testing.assert_allclose(rpos, pos, atol=1e-6)
        np.testing.assert_allclose(rvel, vel, atol=1e-6)
        np.testing.assert_array_equal(types, [1, 2, 1, 2])   # by appearance
        np.testing.assert_allclose(box, np.diag([8., 9., 10.]), atol=1e-6)

    def test_plain_xyz_and_loader_autodetect(self, tmp_path):
        path, pos, _ = self._write(tmp_path, plain=True)
        traj = TrajectoryLoader(str(path), dt=0.01, unwrap=False).load()
        assert traj.n_frames == 3 and traj.n_atoms == 4
        np.testing.assert_allclose(traj.positions, pos, atol=1e-6)
        assert np.all(traj.velocities == 0)

    def test_lattice_rows_become_columns(self, tmp_path):
        """Triclinic extxyz Lattice rows are cell vectors; Trajectory stores
        columns (Cartesian = H @ frac)."""
        from psa_tpu.io.lammps import read_extxyz
        path = tmp_path / "tri.extxyz"
        path.write_text(
            '1\nLattice="10 0 0 1.5 11 0 0.5 2 12" Properties=species:S:1:pos:R:3\n'
            'Si 1.0 2.0 3.0\n')
        _, _, _, _, box = read_extxyz(path)
        expected = np.array([[10, 1.5, 0.5], [0, 11, 2], [0, 0, 12]],
                            dtype=np.float32)
        np.testing.assert_allclose(box, expected, atol=1e-6)


class TestH5MD:
    """H5MD (HDF5 MD-interchange) reader: standard layout, fixed-vs-value
    element spellings, row->column box transpose, loader autodetect."""

    def _write(self, tmp_path, with_vel=True, box_33=False, fixed_species=True,
               npt_box=False, with_mass=False):
        h5py = pytest.importorskip("h5py")
        rng = np.random.default_rng(8)
        n_t, n_a = 4, 6
        pos = rng.uniform(0, 9, (n_t, n_a, 3)).astype(np.float32)
        vel = rng.normal(0, 1, (n_t, n_a, 3)).astype(np.float32)
        path = tmp_path / "t.h5md"
        with h5py.File(path, "w") as f:
            g = f.create_group("particles/all")
            p = g.create_group("position")
            p.create_dataset("value", data=pos)
            p.create_dataset("step", data=np.arange(n_t) * 10)
            if with_vel:
                g.create_group("velocity").create_dataset("value", data=vel)
            if fixed_species:
                g.create_dataset("species", data=np.array([1, 2, 1, 2, 1, 2]))
            else:
                g.create_group("species").create_dataset(
                    "value", data=np.tile([1, 2, 1, 2, 1, 2], (n_t, 1)))
            if with_mass:
                g.create_dataset("mass", data=np.array([1., 3., 1., 3., 1., 3.]))
            box = g.create_group("box")
            if npt_box:
                edges = np.stack([np.diag([9. + t, 10., 11.]) for t in range(n_t)])
                box.create_group("edges").create_dataset("value", data=edges)
            elif box_33:
                # H5MD stores cell vectors as ROWS
                box.create_dataset("edges", data=np.array(
                    [[9., 0., 0.], [1.5, 10., 0.], [0.5, 2.0, 11.]]))
            else:
                box.create_dataset("edges", data=np.array([9., 10., 11.]))
        return path, pos, vel

    def test_full_layout(self, tmp_path):
        from psa_tpu.io.h5md import read_h5md
        path, pos, vel = self._write(tmp_path)
        rpos, rvel, types, steps, box, masses = read_h5md(path)
        np.testing.assert_allclose(rpos, pos, atol=0)
        np.testing.assert_allclose(rvel, vel, atol=0)
        np.testing.assert_array_equal(types, [1, 2, 1, 2, 1, 2])
        np.testing.assert_array_equal(steps, [0, 10, 20, 30])
        np.testing.assert_allclose(box, np.diag([9., 10., 11.]), atol=1e-6)
        assert masses is None

    def test_row_vectors_become_columns(self, tmp_path):
        from psa_tpu.io.h5md import read_h5md
        path, _, _ = self._write(tmp_path, box_33=True)
        *_, box, _ = read_h5md(path)
        expect = np.array([[9., 0., 0.], [1.5, 10., 0.], [0.5, 2.0, 11.]]).T
        np.testing.assert_allclose(box, expect, atol=1e-6)

    def test_no_velocity_and_timedep_species(self, tmp_path):
        from psa_tpu.io.h5md import read_h5md
        path, _, _ = self._write(tmp_path, with_vel=False, fixed_species=False)
        _, rvel, types, *_ = read_h5md(path)
        assert np.all(rvel == 0)
        np.testing.assert_array_equal(types, [1, 2, 1, 2, 1, 2])

    def test_npt_box_uses_frame0(self, tmp_path):
        from psa_tpu.io.h5md import read_h5md
        path, _, _ = self._write(tmp_path, npt_box=True)
        *_, box, _ = read_h5md(path)
        np.testing.assert_allclose(box, np.diag([9., 10., 11.]), atol=1e-6)

    def test_mass_and_loader_autodetect(self, tmp_path):
        path, pos, _ = self._write(tmp_path, with_mass=True)
        # unwrap=False: raw random positions are not a continuous walk
        traj = TrajectoryLoader(str(path), dt=0.02, unwrap=False).load()
        np.testing.assert_allclose(traj.positions, pos, atol=0)
        assert traj.masses is not None
        np.testing.assert_allclose(traj.masses, [1., 3., 1., 3., 1., 3.])
        assert traj.dt_ps == 0.02

    def test_not_h5md_raises(self, tmp_path):
        h5py = pytest.importorskip("h5py")
        from psa_tpu.io.h5md import read_h5md
        path = tmp_path / "empty.h5"
        with h5py.File(path, "w") as f:
            f.create_group("not_particles")
        with pytest.raises(ValueError, match="particles"):
            read_h5md(path)

    def test_npt_vector_edges_not_mistaken_for_cell_matrix(self, tmp_path):
        """A 3-frame time-dependent (3, 3)-shaped per-frame DIAGONAL edges
        value must read as frame-0 orthorhombic — the spelling (group with
        'value'), not the shape, decides time-dependence."""
        h5py = pytest.importorskip("h5py")
        from psa_tpu.io.h5md import read_h5md
        rng = np.random.default_rng(4)
        pos = rng.uniform(0, 9, (3, 4, 3)).astype(np.float32)
        path = tmp_path / "npt3.h5md"
        with h5py.File(path, "w") as f:
            g = f.create_group("particles/all")
            g.create_group("position").create_dataset("value", data=pos)
            edges = np.array([[9., 10., 11.], [9.1, 10., 11.], [9.2, 10., 11.]])
            g.create_group("box").create_group("edges").create_dataset(
                "value", data=edges)
        *_, box, _ = read_h5md(path)
        np.testing.assert_allclose(box, np.diag([9., 10., 11.]), atol=1e-6)

    def test_unwrap_uses_image_element(self, tmp_path):
        """With unwrap=True an H5MD image element gives the exact unwrap
        r + H·image (a crossing atom, undetectable by minimum-image alone
        in 2 frames, is recovered exactly)."""
        h5py = pytest.importorskip("h5py")
        from psa_tpu.io.h5md import read_h5md
        L = 10.0
        true_x = np.array([[9.5], [10.5]])            # crosses the boundary
        wrapped = true_x % L
        images = (true_x // L)
        pos = np.zeros((2, 1, 3), dtype=np.float32)
        pos[:, 0, 0] = wrapped[:, 0]
        img = np.zeros((2, 1, 3))
        img[:, 0, 0] = images[:, 0]
        path = tmp_path / "img.h5md"
        with h5py.File(path, "w") as f:
            g = f.create_group("particles/all")
            g.create_group("position").create_dataset("value", data=pos)
            g.create_group("image").create_dataset("value", data=img)
            g.create_group("box").create_dataset("edges", data=[L, L, L])
        rpos, *_ = read_h5md(path, unwrap=True)
        np.testing.assert_allclose(rpos[:, 0, 0], true_x[:, 0], atol=1e-5)

    def test_masses_survive_cache_hit(self, tmp_path):
        """The .npy sidecar cache must round-trip masses (it gets its own
        optional sidecar) — mass_weighted workflows kept working only until
        the second load before this."""
        path, pos, _ = self._write(tmp_path, with_mass=True)
        t1 = TrajectoryLoader(str(path), dt=0.02).load()   # parses + caches
        t2 = TrajectoryLoader(str(path), dt=0.02).load()   # cache hit
        assert t2.masses is not None
        np.testing.assert_allclose(t2.masses, t1.masses)


class TestOvitoBackend:
    """The optional OVITO backend, exercised against a mocked ovito package
    (VERDICT r2: the branch had zero coverage, so signature rot against the
    ovito API would go unnoticed)."""

    def _install_fake_ovito(self, monkeypatch, n_frames=3, n_atoms=4,
                            with_velocities=True):
        import sys
        import types

        rng = np.random.default_rng(0)
        positions = rng.uniform(0, 5, size=(n_frames, n_atoms, 3)).astype(np.float32)
        velocities = rng.normal(size=(n_frames, n_atoms, 3)).astype(np.float32)

        class FakeParticles:
            def __init__(self, i):
                self.positions = positions[i]
                self.velocities = velocities[i] if with_velocities else None
                self.particle_types = np.array([1, 1, 2, 2], dtype=np.int32)

        class FakeCell:
            matrix = np.hstack([np.diag([5.0, 5.0, 5.0]),
                                np.zeros((3, 1))]).astype(np.float32)

        class FakeFrame:
            def __init__(self, i):
                self.particles = FakeParticles(i)
                self.cell = FakeCell()

        class FakeSource:
            num_frames = n_frames

        class FakePipeline:
            def __init__(self):
                self.source = FakeSource()
                self.modifiers = []

            def compute(self, i):
                return FakeFrame(i)

        calls = {}

        def import_file(path, input_format=None):
            calls['path'] = path
            calls['input_format'] = input_format
            return FakePipeline()

        ovito = types.ModuleType('ovito')
        ovito_io = types.ModuleType('ovito.io')
        ovito_io.import_file = import_file
        ovito_mod = types.ModuleType('ovito.modifiers')
        ovito_mod.UnwrapTrajectoriesModifier = type(
            'UnwrapTrajectoriesModifier', (), {})
        ovito.io = ovito_io
        ovito.modifiers = ovito_mod
        monkeypatch.setitem(sys.modules, 'ovito', ovito)
        monkeypatch.setitem(sys.modules, 'ovito.io', ovito_io)
        monkeypatch.setitem(sys.modules, 'ovito.modifiers', ovito_mod)
        return positions, velocities, calls

    def test_ovito_backend_loads(self, tmp_path, monkeypatch):
        positions, velocities, calls = self._install_fake_ovito(monkeypatch)
        f = tmp_path / "exotic.dump"
        f.write_text("not really parsed by the fake\n")
        progress_calls = []
        loader = TrajectoryLoader(str(f), dt=0.01, backend='ovito',
                                  progress=lambda d, t: progress_calls.append((d, t)))
        traj = loader._load_via_ovito()   # bypass the npy cache fast path
        assert traj.n_frames == 3 and traj.n_atoms == 4
        np.testing.assert_allclose(traj.positions, positions)
        np.testing.assert_allclose(traj.velocities, velocities)
        np.testing.assert_array_equal(traj.types, [1, 1, 2, 2])
        np.testing.assert_allclose(traj.box_matrix, np.diag([5.0, 5.0, 5.0]))
        assert calls['input_format'] == 'lammps/dump'
        assert progress_calls == [(1, 3), (2, 3), (3, 3)]

    def test_ovito_backend_without_velocities_zero_fills(self, tmp_path,
                                                         monkeypatch):
        self._install_fake_ovito(monkeypatch, with_velocities=False)
        f = tmp_path / "posonly.dump"
        f.write_text("x\n")
        traj = TrajectoryLoader(str(f), dt=0.01,
                                backend='ovito')._load_via_ovito()
        assert np.all(traj.velocities == 0)

    def test_missing_ovito_raises_importerror(self, tmp_path, monkeypatch):
        import builtins
        import sys
        monkeypatch.delitem(sys.modules, 'ovito', raising=False)
        monkeypatch.delitem(sys.modules, 'ovito.io', raising=False)
        real_import = builtins.__import__

        def no_ovito(name, *a, **k):
            if name.startswith('ovito'):
                raise ImportError('no ovito here')
            return real_import(name, *a, **k)
        monkeypatch.setattr(builtins, '__import__', no_ovito)
        f = tmp_path / "t.dump"
        f.write_text("x\n")
        with pytest.raises(ImportError, match="ovito"):
            TrajectoryLoader(str(f), dt=0.01, backend='ovito')._load_via_ovito()
