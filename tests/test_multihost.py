"""Two-process multi-controller sharded SED (real jax.distributed processes).

Validates what the virtual-mesh tests cannot: per-process shard ingestion
(each process reads ONLY its addressable (time, atom) windows) and the
process_allgather readback of k-sharded spectra — the pod data path run on
genuinely separate JAX controllers.
"""
import subprocess
import sys
from pathlib import Path

SCRIPT = Path(__file__).resolve().parents[1] / "scripts" / "multihost_smoke.py"


def test_two_process_sharded_sweep():
    proc = subprocess.run([sys.executable, str(SCRIPT)], capture_output=True,
                          text=True, timeout=420,
                          env={**__import__('os').environ,
                               'PSA_MH_PORT': '12791'})
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "multihost smoke: PASS" in proc.stdout
    assert proc.stdout.count("OK") == 2
