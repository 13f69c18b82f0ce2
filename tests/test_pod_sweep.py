"""End-to-end pod_sweep script runs (subprocess, 8-device CPU mesh).

The pod orchestration script is the north-star entry point; these tests
drive it as a user would — a text dump in, cached chunk files and result
arrays out — and pin its outputs to the in-library engines.
"""
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.models import make_square_lattice_trajectory

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "pod_sweep.py"

RUNNER = """
import sys
import jax
jax.config.update('jax_platforms', 'cpu')
sys.argv = ['pod_sweep.py'] + sys.argv[1:]
import runpy
runpy.run_path({script!r}, run_name='__main__')
"""


@pytest.fixture(scope='module')
def square_dump(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("podsweep")
    traj = make_square_lattice_trajectory(n_cells=8, n_frames=48, dt_ps=0.01)
    dump = tmp / "sq.dump"
    with open(dump, "w") as f:
        for t in range(traj.n_frames):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n"
                    f"{traj.n_atoms}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                f.write(f"0.0 {traj.box_matrix[d, d]:.6f}\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for a in range(traj.n_atoms):
                p, v = traj.positions[t, a], traj.velocities[t, a]
                f.write(f"{a + 1} 1 {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
    return dump, traj


def run_pod_sweep(args, timeout=600):
    import os
    env = dict(os.environ)
    env['XLA_FLAGS'] = (env.get('XLA_FLAGS', '')
                        + ' --xla_force_host_platform_device_count=8').strip()
    proc = subprocess.run(
        [sys.executable, '-c', RUNNER.format(script=str(SCRIPT))] + args,
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return proc


@pytest.mark.slow
def test_from_dump_gridded_peaks_matches_resident(square_dump, tmp_path):
    """--from-dump --engine gridded --peaks: the dump streams straight into
    every ky stripe; the dispersion surface must be bin-for-bin identical
    to the resident single-device NUFFT engine."""
    dump, traj = square_dump
    out = tmp_path / "out"
    run_pod_sweep(['--trajectory', str(dump), '--dt', '0.01',
                   '--nx', '8', '--ny', '8', '--nz', '1',
                   '--grid', '8', '--k-min', '-1.2', '--k-max', '1.2',
                   '--k-chunk', '64', '--peaks', '1', '--engine', 'gridded',
                   '--from-dump', '--t-superchunk', '16',
                   '--out', str(out)])
    d = np.load(out / "kgrid_peaks.npz")
    calc = SEDCalculator(traj, nx=8, ny=8, nz=1)
    pf, ph, pw = calc.calculate_kgrid_peaks(
        d['k_vectors'], n_peaks=1, engine='gridded',
        k_grid_shape=tuple(d['k_grid_shape']))
    np.testing.assert_allclose(d['peak_freqs'], pf, atol=1e-6)
    np.testing.assert_allclose(d['peak_heights'], ph, rtol=1e-4)


def test_lt_planes_match_single_chip(square_dump, tmp_path):
    """--lt: the pod L/T plane pair must match the single-chip
    calculate_lt and sum to the browse intensity."""
    dump, traj = square_dump
    out = tmp_path / "out_lt"
    run_pod_sweep(['--trajectory', str(dump), '--dt', '0.01',
                   '--nx', '8', '--ny', '8', '--nz', '1',
                   '--grid', '8', '--k-min', '-1.2', '--k-max', '1.2',
                   '--k-chunk', '32', '--lt', '--from-dump',
                   '--out', str(out)])
    d = np.load(out / "kgrid_lt.npz")
    calc = SEDCalculator(traj, nx=8, ny=8, nz=1)
    rf, ril, rit = calc.calculate_lt(d['k_vectors'])
    np.testing.assert_allclose(d['freqs'], rf, atol=0)
    # z-polarized modes with in-plane k: everything is transverse
    scale = rit.max()
    assert scale > 0 and ril.max() < 1e-8 * scale
    assert np.abs(d['i_long'] - ril).max() < 1e-5 * scale
    assert np.abs(d['i_trans'] - rit).max() < 1e-5 * scale


def test_dsf_planes_match_single_chip(square_dump, tmp_path):
    """--dsf: the pod (S, C_L, C_T) triplet must match single-chip
    calculate_dsf, streaming positions AND velocities from the text dump."""
    dump, traj = square_dump
    out = tmp_path / "out_dsf"
    run_pod_sweep(['--trajectory', str(dump), '--dt', '0.01',
                   '--nx', '8', '--ny', '8', '--nz', '1',
                   '--grid', '6', '--k-min', '-1.0', '--k-max', '1.0',
                   '--k-chunk', '20', '--dsf', '--from-dump',
                   '--out', str(out)])
    d = np.load(out / "kgrid_dsf.npz")
    # the sweep snapped the raster onto the box reciprocal lattice
    from psa_tpu.ops.instantaneous import commensurate_deviation
    assert commensurate_deviation(d['k_vectors'], traj.box_matrix) < 1e-4
    calc = SEDCalculator(traj, nx=8, ny=8, nz=1)
    rf, rs, rcl, rct = calc.calculate_dsf(d['k_vectors'])
    np.testing.assert_allclose(d['freqs'], rf, atol=0)
    for got, want in ((d['s'], rs), (d['c_long'], rcl), (d['c_trans'], rct)):
        assert np.abs(got - want).max() <= 1e-5 * max(want.max(), 1.0)


def test_sharded_peaks_resume_from_cache(square_dump, tmp_path):
    """Interrupted sweeps resume: a second identical run must restore all
    chunks from the cache (and say so) without recomputing."""
    dump, traj = square_dump
    out = tmp_path / "out_direct"
    args = ['--trajectory', str(dump), '--dt', '0.01',
            '--nx', '8', '--ny', '8', '--nz', '1',
            '--grid', '8', '--k-min', '-1.2', '--k-max', '1.2',
            '--k-chunk', '32', '--peaks', '1', '--from-dump',
            '--out', str(out)]
    run_pod_sweep(args)
    first = np.load(out / "kgrid_peaks.npz")['peak_freqs']
    proc = run_pod_sweep(args)                      # resume pass
    assert '0/64 k-points computed' in proc.stdout + proc.stderr
    second = np.load(out / "kgrid_peaks.npz")['peak_freqs']
    np.testing.assert_allclose(second, first, atol=0)
