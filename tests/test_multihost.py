"""Two-process multi-controller sharded paths (real jax.distributed processes).

Validates what the virtual-mesh tests cannot: per-process shard ingestion
(each process reads ONLY its addressable (time, atom) windows; the DSF smoke
ingests a real LAMMPS dump through DumpBlockSource.sibling), and the
process_allgather readback of k-sharded outputs — the pod data path run on
genuinely separate JAX controllers.  All slow-marked: each launches two
fresh interpreters that compile their own programs.
"""
import os
import subprocess
import sys
from pathlib import Path

import pytest

SCRIPTS = Path(__file__).resolve().parents[1] / "scripts"

pytestmark = pytest.mark.slow


def _run(script: str, port_env: str, port: str):
    return subprocess.run([sys.executable, str(SCRIPTS / script)],
                          capture_output=True, text=True, timeout=540,
                          env={**os.environ, port_env: port})


@pytest.fixture(scope='module')
def sed_smoke():
    return _run("multihost_smoke.py", 'PSA_MH_PORT', '12791')


@pytest.fixture(scope='module')
def dsf_smoke():
    return _run("multihost_smoke_dsf.py", 'PSA_MH_DSF_PORT', '12799')


def test_two_process_sharded_sed(sed_smoke):
    assert sed_smoke.returncode == 0, sed_smoke.stdout + sed_smoke.stderr
    assert "multihost smoke: PASS" in sed_smoke.stdout
    assert sed_smoke.stdout.count("OK") == 2


def test_two_process_sed_reads_only_addressable_windows(sed_smoke):
    # each rank reports how many trajectory elements it parsed; the smoke
    # asserts <= half, and prints the counts — pin that they're present
    assert sed_smoke.returncode == 0, sed_smoke.stdout + sed_smoke.stderr
    assert sed_smoke.stdout.count("trajectory elements") == 2


def test_two_process_npt_mesh_sweeps(sed_smoke):
    """calculate_npt_browse/peaks(mesh=...) — the fractional phase anchor
    across a real process boundary, vs the f64 NPT oracle (round-5 forms)."""
    assert sed_smoke.returncode == 0, sed_smoke.stdout + sed_smoke.stderr
    assert sed_smoke.stdout.count("npt browse rel err") == 2
    assert sed_smoke.stdout.count("npt peaks match") == 2


def test_two_process_sharded_dsf_family(dsf_smoke):
    """sharded_dsf / sk / isf / dsf_self across 2 processes × 4 devices,
    ingested per-process from a LAMMPS dump (VERDICT r4 item 5)."""
    assert dsf_smoke.returncode == 0, dsf_smoke.stdout + dsf_smoke.stderr
    assert "multihost DSF smoke: PASS" in dsf_smoke.stdout
    for key in ("dsf", "sk", "isf", "dsf_self"):
        assert dsf_smoke.stdout.count(f"{key} ") >= 2, (key, dsf_smoke.stdout)


def test_two_process_sharded_timecorr(dsf_smoke):
    """sharded_timecorr (msd + vacf) across the same 2-process mesh."""
    assert dsf_smoke.returncode == 0, dsf_smoke.stdout + dsf_smoke.stderr
    assert dsf_smoke.stdout.count("msd") >= 2
    assert dsf_smoke.stdout.count("vacf") >= 2
    assert dsf_smoke.stdout.count("rank 0: OK") == 1
    assert dsf_smoke.stdout.count("rank 1: OK") == 1
