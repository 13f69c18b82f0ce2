#!/usr/bin/env python
"""TPU campaign phase 1: projection-kernel shootout at the production shape.

Times the XLA materialize-table path against the Pallas v1 and v2 fused
kernels (several tile configs) on the real chip.  Shape matches the round-1
measurement (M=6144, A=20480, K=512) so numbers are comparable, plus one
bigger-M shape closer to the bench workload.

Timing fence: scalar checksum readback (block_until_ready returns at enqueue
on this runtime).  Run as the ONLY TPU process.
"""
import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, '/root/repo')
from psa_tpu.ops import spectral
from psa_tpu.ops.pallas_sed import sed_projection_pallas, sed_projection_pallas_v2


def log(msg):
    print(msg, flush=True)


@jax.jit
def _checksum(re, im):
    return re[0, 0] + re[-1, -1] + im[0, -1] + im[-1, 0]


def time_fn(label, fn, reps=3):
    # compile + warm
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


def xla_projection(data2d, hi, lo, kv):
    @jax.jit
    def f(d, h, l, k):
        cs = spectral._phase_table(h, l, k)
        proj = jax.lax.dot_general(d, cs, (((1,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)
        nk = k.shape[0]
        return proj[:, :nk], proj[:, nk:]
    return lambda: f(data2d, hi, lo, kv)


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
        dt = time_fn("xla", xla_projection(d, h, l, kd))
        shape_res['xla'] = flops / dt / 1e12

        configs = [
            ('v1 256/256/512', lambda: sed_projection_pallas(d, h, l, kd, bm=256, bk=256, ba=512)),
            ('v1 1024/256/512', lambda: sed_projection_pallas(d, h, l, kd, bm=1024, bk=256, ba=512)),
            ('v2 1024/256/512', lambda: sed_projection_pallas_v2(d, h, l, kd, bm=1024, bk=256, ba=512)),
            ('v2 512/256/1024', lambda: sed_projection_pallas_v2(d, h, l, kd, bm=512, bk=256, ba=1024)),
            ('v2 1024/512/512', lambda: sed_projection_pallas_v2(d, h, l, kd, bm=1024, bk=512, ba=512)),
            ('v2 2048/256/512', lambda: sed_projection_pallas_v2(d, h, l, kd, bm=2048, bk=256, ba=512)),
        ]
        for label, fn in configs:
            try:
                dt = time_fn(label, fn)
                shape_res[label] = flops / dt / 1e12
            except Exception as e:
                log(f"  {label}: FAILED {type(e).__name__}: {e}")
                shape_res[label] = None
        for lbl, tf in shape_res.items():
            log(f"  >> {lbl}: {tf:.1f} TF/s" if tf else f"  >> {lbl}: failed")
        results[f"M{m}_A{a}_K{k}"] = shape_res

    with open('/root/repo/scripts/tpu_campaign/kernel_shootout.json', 'w') as f:
        json.dump(results, f, indent=1)
    log("WROTE kernel_shootout.json")


if __name__ == '__main__':
    main()
