"""Out-of-core streaming SED vs the in-memory engine."""
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.streaming import sed_from_dump_streaming
from psa_tpu.models import make_chain_trajectory


@pytest.fixture(scope='module')
def dump_with_velocities(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    traj = make_chain_trajectory(n_cells=12, n_frames=50, dt_ps=0.02)
    dump = tmp / "s.dump"
    with open(dump, "w") as f:
        for t in range(traj.n_frames):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n{traj.n_atoms}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                f.write(f"0.0 {traj.box_matrix[d, d]:.6f}\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for a in range(traj.n_atoms):
                p, v = traj.positions[t, a], traj.velocities[t, a]
                f.write(f"{a+1} 1 {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
    return dump, traj


def test_streaming_matches_in_memory(dump_with_velocities):
    dump, traj = dump_with_velocities
    calc = SEDCalculator(traj, nx=12, ny=1, nz=1)
    k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=7)
    in_mem = calc.calculate(k_mags, k_vecs)
    # uneven chunking exercises the padded flush path (50 = 3*16 + 2)
    streamed = sed_from_dump_streaming(dump, dt_ps=0.02, k_vectors=k_vecs,
                                       frame_chunk=16, k_points_mags=k_mags)
    # velocities round-trip through 6-decimal text: tolerance reflects that
    scale = np.abs(in_mem.sed).max()
    assert np.abs(streamed.sed - in_mem.sed).max() / scale < 1e-4
    np.testing.assert_allclose(streamed.freqs, in_mem.freqs, atol=1e-9)


def test_streaming_displacement_mode(dump_with_velocities):
    dump, traj = dump_with_velocities
    calc = SEDCalculator(traj, nx=12, ny=1, nz=1, use_displacements=True)
    k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=5)
    in_mem = calc.calculate(k_mags, k_vecs)
    streamed = sed_from_dump_streaming(dump, dt_ps=0.02, k_vectors=k_vecs,
                                       frame_chunk=8, use_displacements=True,
                                       k_points_mags=k_mags)
    scale = np.abs(in_mem.sed).max()
    assert np.abs(streamed.sed - in_mem.sed).max() / scale < 1e-4


def test_streaming_no_velocities_raises(tmp_path):
    dump = tmp_path / "nv.dump"
    with open(dump, "w") as f:
        for t in range(3):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n2\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n0 5\n0 5\n0 5\n")
            f.write("ITEM: ATOMS id type x y z\n1 1 0 0 0\n2 1 1 0 0\n")
    with pytest.raises(ValueError, match="velocity"):
        sed_from_dump_streaming(dump, dt_ps=0.01,
                                k_vectors=np.ones((2, 3), np.float32))


def test_streaming_precomputed_mean(dump_with_velocities):
    dump, traj = dump_with_velocities
    mean64 = np.mean(traj.positions, axis=0, dtype=np.float64)
    k_vecs = np.outer(np.linspace(0, 1, 4), [1, 0, 0]).astype(np.float32)
    a = sed_from_dump_streaming(dump, 0.02, k_vecs, mean_pos64=mean64)
    b = sed_from_dump_streaming(dump, 0.02, k_vecs)
    # pass-1 mean from text positions vs exact mean: tiny differences only
    assert np.abs(a.sed - b.sed).max() / np.abs(b.sed).max() < 1e-3


def test_mmap_source_matches_iterator(dump_with_velocities):
    """The native mmap frame source must produce identical windows to the
    line iterator."""
    from psa_tpu.io import native
    from psa_tpu.io.lammps import MmapDumpFrames, iter_lammps_frames
    dump, traj = dump_with_velocities
    if not native.bulk_dump_available():
        pytest.skip("native parallel parser unavailable")
    src = MmapDumpFrames(dump)
    assert src.n_frames == traj.n_frames and src.n_atoms == traj.n_atoms
    frames = list(iter_lammps_frames(dump))
    pos, vel = src.frames(10, 23)
    for k, f in enumerate(frames[10:23]):
        np.testing.assert_allclose(pos[k], f.positions, atol=0)
        np.testing.assert_allclose(vel[k], f.velocities, atol=0)
    np.testing.assert_array_equal(src.types, frames[0].types)
    src.close()


def test_streaming_without_native_matches(dump_with_velocities, monkeypatch):
    """Force the line-iterator fallback; results must match the native path."""
    import psa_tpu.core.streaming as S
    dump, traj = dump_with_velocities
    calc = SEDCalculator(traj, nx=12, ny=1, nz=1)
    k_mags, k_vecs = calc.get_k_path('x', bz_coverage=0.5, n_k=5)
    native_sed = sed_from_dump_streaming(dump, dt_ps=0.02, k_vectors=k_vecs,
                                         frame_chunk=16)
    monkeypatch.setattr(S, '_open_mmap_source', lambda p: None)
    fallback_sed = sed_from_dump_streaming(dump, dt_ps=0.02, k_vectors=k_vecs,
                                           frame_chunk=16)
    np.testing.assert_allclose(native_sed.sed, fallback_sed.sed, atol=1e-7)
