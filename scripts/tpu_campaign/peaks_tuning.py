#!/usr/bin/env python
"""TPU tuning: chunk shapes for gridded peak extraction at the 200² shape.

peaks_engines.json measured auto-chunked gridded peaks at 11,512 k-points/s
(1.37× direct).  The browse chunk sweeps found gy=22 and quartered row
chunks ~1.4× faster above the readback floor; with the floor gone (peaks
readback is 1.4 MB) the kernel difference should show directly.
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, '/root/repo')
from _workload import make_si_calculator
from psa_tpu.ops import gridded, spectral


def log(msg):
    print(msg, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    n_atoms, n_t = 100_000, 2500
    calc, side = make_si_calculator(n_atoms, n_t)

    g = 200
    _, k_vecs, shape = calc.get_k_grid('xy', (-5.0, 5.0), (-5.0, 5.0), g, g)
    kx_vals, ky_vals, k_fixed, axes = calc._detect_grid_axes(
        np.asarray(k_vecs, dtype=np.float32), shape)
    plan = gridded.plan_kgrid(calc.mean_positions64, kx_vals, ky_vals,
                              k_fixed=k_fixed, axes=axes)
    log(f"plan: rows={plan.n_rows} P={plan.bucket_size}")
    data_dev, _, _ = calc._group_device_arrays(np.arange(n_atoms))
    freqs = spectral.fftfreq_thz(n_t, 0.01)
    mask = freqs >= 0
    freq_idx = np.flatnonzero(mask).astype(np.int32)
    fk = freqs[mask].astype(np.float32)

    q = max(1, plan.n_rows // 4)
    configs = [
        {},                                     # auto baseline (11,512 prior)
        {'gy_chunk': 22},
        {'cell_chunk': q, 'gy_chunk': 22},
        {'cell_chunk': q, 'gy_chunk': 11},
    ]
    out = {"config": {"atoms": n_atoms, "steps": n_t, "grid": g,
                      "rows": plan.n_rows, "P": plan.bucket_size},
           "runs": []}
    ref = None
    for cfg in configs:
        name = ",".join(f"{k}={v}" for k, v in cfg.items()) or "auto"
        t0 = time.time()
        pf, ph, pw = gridded.gridded_kgrid_browse(
            data_dev, plan, freq_idx, precision='parity', n_peaks=2,
            freqs_kept=fk, **cfg)
        first = time.time() - t0
        warms = []
        for _ in range(2):
            t0 = time.time()
            pf, ph, pw = gridded.gridded_kgrid_browse(
                data_dev, plan, freq_idx, precision='parity', n_peaks=2,
                freqs_kept=fk, **cfg)
            warms.append(time.time() - t0)
        warm = min(warms)
        if ref is None:
            ref = pf
        agree = float(np.mean(np.abs(pf - ref) < 1e-6))
        out["runs"].append({"config": name, "first_s": round(first, 1),
                            "warm_s": round(warm, 2),
                            "kps": round(g * g / warm, 1), "agree": agree})
        log(f"{name}: warm {warm:.2f}s ({g*g/warm:.0f} k-points/s) "
            f"first {first:.1f}s agree {agree:.4f}")
        with open('/root/repo/scripts/tpu_campaign/peaks_tuning.json',
                  'w') as f:
            json.dump(out, f, indent=1)
    log("done")


if __name__ == '__main__':
    main()
