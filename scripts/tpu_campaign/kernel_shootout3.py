#!/usr/bin/env python
"""TPU campaign phase 1c: v1 (reduction-innermost, correct-on-HW) tile sweep.

v2's schedule (m innermost, accumulation dim in the middle) revisits output
blocks at non-consecutive grid steps — illegal for Pallas TPU accumulation;
it miscomputes on hardware (rel err ~1 vs XLA; interpret mode hid it).  This
sweep pushes v1 (a innermost — legal accumulation) to larger M tiles, which
divides the per-M-block angle/cos/sin recompute, with a raised vmem limit.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from psa_tpu.ops import spectral
from psa_tpu.ops.pallas_sed import sed_projection_pallas


def log(msg):
    print(msg, flush=True)


@jax.jit
def _checksum(re, im):
    return re[0, 0] + re[-1, -1] + im[0, -1] + im[-1, 0]


def time_fn(label, fn, reps=3):
    t0 = time.time()
    out = fn()
    c0 = float(_checksum(*out))
    compile_s = time.time() - t0
    del out
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        c = float(_checksum(*out))
        del out
    dt = (time.time() - t0) / reps
    log(f"  {label}: {dt*1e3:.1f} ms/call (compile {compile_s:.1f}s, checksum {c:.4g})")
    return dt


def main():
    log(f"devices: {jax.devices()}")
    m, a, k = 30720, 20480, 512
    rng = np.random.default_rng(0)
    data2d = rng.standard_normal((m, a), dtype=np.float32)
    mean64 = rng.uniform(0, 100.0, (a, 3))
    hi, lo = spectral.split_f64(mean64)
    kv = rng.uniform(-3, 3, (k, 3)).astype(np.float32)
    d = jax.device_put(data2d)
    h = jax.device_put(hi)
    l = jax.device_put(lo)
    kd = jax.device_put(kv)
    flops = 2.0 * m * a * 2 * k
    log(f"=== shape M={m} A={a} K={k} ({flops/1e12:.2f} TFLOP/call) ===")
    results = {}
    for bm, bk, ba, vmem in [(512, 128, 512, None), (512, 256, 512, None),
                             (1024, 128, 512, None), (1024, 256, 512, 64 << 20),
                             (2048, 128, 512, 64 << 20), (1024, 128, 256, None),
                             (512, 512, 512, 64 << 20)]:
        label = f"v1 {bm}/{bk}/{ba}" + (f" vmem{vmem >> 20}M" if vmem else "")
        try:
            dt = time_fn(label, lambda: sed_projection_pallas(
                d, h, l, kd, bm=bm, bk=bk, ba=ba, vmem_limit_bytes=vmem))
            results[label] = flops / dt / 1e12
        except Exception as e:
            log(f"  {label}: FAILED {type(e).__name__}")
            results[label] = None
    for lbl, tf in results.items():
        log(f"  >> {lbl}: {tf:.1f} TF/s" if tf else f"  >> {lbl}: failed")
    with open('/root/repo/scripts/tpu_campaign/kernel_shootout3.json', 'w') as f:
        json.dump(results, f, indent=1)
    log("WROTE kernel_shootout3.json")


if __name__ == '__main__':
    main()
