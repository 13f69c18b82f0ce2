"""Driver entry points: single-chip forward + multichip dry run on the CPU mesh."""
import sys
import time
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    re, im = jax.jit(fn)(*args)
    assert re.shape == (128, 64, 3)
    assert np.all(np.isfinite(np.asarray(re)))


@pytest.mark.parametrize("n", [1, 2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n, full=False)


@pytest.mark.slow
def test_dryrun_multichip_full_tier():
    """The extended observable tier (L/T, DSF/liquid families, mesh NUFFT,
    k-outer placement) is behind PSA_DRYRUN_FULL for the driver capture but
    must stay green — exercised here on the 8-device virtual mesh."""
    graft.dryrun_multichip(8, full=True)


@pytest.mark.slow
def test_dryrun_self_bootstraps_when_short_on_devices():
    """With fewer local devices than requested, the dry run must re-exec on a
    virtual CPU mesh of the right size instead of raising (this test process
    has 8 devices; 16 forces the subprocess path).  The fast core must clear
    the subprocess's own 900 s cap with wide margin (round-4 VERDICT item 1
    budget: the driver's capture must never ride the timeout cliff)."""
    t0 = time.monotonic()
    graft.dryrun_multichip(16, full=False)
    assert time.monotonic() - t0 < 600, "n=16 fast-core dryrun too close to the 900 s cap"
