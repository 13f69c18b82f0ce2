"""Driver entry points: single-chip forward + multichip dry run on the CPU mesh."""
import sys
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
    graft.dryrun_multichip(n)


def test_dryrun_self_bootstraps_when_short_on_devices():
    """With fewer local devices than requested, the dry run must re-exec on a
    virtual CPU mesh of the right size instead of raising (this test process
    has 8 devices; 16 forces the subprocess path)."""
    graft.dryrun_multichip(16)
