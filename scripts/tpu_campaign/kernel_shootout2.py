#!/usr/bin/env python
"""TPU campaign phase 1b: Pallas v2 with VMEM-safe tile configs.

Phase 1a showed every config with bm>=1024 (and ba=1024 at bm=512) exceeds
the 16 MB scoped-VMEM limit under Pallas double-buffering.  This pass sweeps
small-tile v2 configs against the phase-1a XLA numbers (4.9 / 17.7 TF/s at
the two shapes).
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from psa_tpu.ops import spectral
from psa_tpu.ops.pallas_sed import sed_projection_pallas_v2


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
    results = {}
    for (m, a, k) in [(6144, 20480, 512), (30720, 20480, 512)]:
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
        shape_res = {}
        for bm, bk, ba in [(256, 256, 512), (512, 256, 512), (512, 128, 512),
                           (256, 128, 1024), (128, 256, 512), (512, 512, 256)]:
            label = f"v2 {bm}/{bk}/{ba}"
            try:
                dt = time_fn(label, lambda: sed_projection_pallas_v2(
                    d, h, l, kd, bm=bm, bk=bk, ba=ba))
                shape_res[label] = flops / dt / 1e12
            except Exception as e:
                log(f"  {label}: FAILED {type(e).__name__}")
                shape_res[label] = None
        for lbl, tf in shape_res.items():
            log(f"  >> {lbl}: {tf:.1f} TF/s" if tf else f"  >> {lbl}: failed")
        results[f"M{m}_A{a}_K{k}"] = shape_res

    with open('/root/repo/scripts/tpu_campaign/kernel_shootout2.json', 'w') as f:
        json.dump(results, f, indent=1)
    log("WROTE kernel_shootout2.json")


if __name__ == '__main__':
    main()
