#!/usr/bin/env python
"""TPU head-to-head: dispersion-surface extraction through both engines.

The peaks readback (1.4 MB at 200²) is ~150× smaller than the browse
planes, so this is the first end-to-end comparison where the gridded
engine's ~Gx/12 FLOP cut is not buried under d2h time.  Direct-peaks
measured 8,411 k-points/s end-to-end earlier (97% of its device rate);
whatever gridded-peaks measures here IS the engine's true relative speed.

Workload: N=1e5, n_t=2500, 200² grid, parity precision, warm × 2 reps —
override with PSA_PEAKS_ATOMS / PSA_PEAKS_STEPS; non-default shapes write a
shape-suffixed JSON so the canonical artifact the docs cite is never
clobbered by a smoke run.
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, '/root/repo')
from _workload import make_si_calculator


def log(msg):
    print(msg, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    import os
    n_atoms = int(os.environ.get('PSA_PEAKS_ATOMS', 100_000))
    n_t = int(os.environ.get('PSA_PEAKS_STEPS', 2500))
    calc, side = make_si_calculator(n_atoms, n_t)

    g = 200
    _, k_vecs, shape = calc.get_k_grid('xy', (-5.0, 5.0), (-5.0, 5.0), g, g)
    out = {"config": {"atoms": n_atoms, "steps": n_t, "grid": g}, "runs": []}
    out_path = '/root/repo/scripts/tpu_campaign/peaks_engines.json' \
        if (n_atoms, n_t) == (100_000, 2500) else \
        f'/root/repo/scripts/tpu_campaign/peaks_engines_{n_atoms}x{n_t}.json'

    def run(label, **kw):
        t0 = time.time()
        res = calc.calculate_kgrid_peaks(k_vecs, n_peaks=2, **kw)
        first = time.time() - t0
        warms = []
        for _ in range(2):
            t0 = time.time()
            res = calc.calculate_kgrid_peaks(k_vecs, n_peaks=2, **kw)
            warms.append(time.time() - t0)
        warm = min(warms)
        out["runs"].append({"engine": label, "first_s": round(first, 1),
                            "warm_s": round(warm, 2),
                            "kps": round(g * g / warm, 1)})
        log(f"{label}: warm {warm:.2f}s ({g*g/warm:.0f} k-points/s), "
            f"first {first:.1f}s")
        with open(out_path,
                  'w') as f:
            json.dump(out, f, indent=1)
        return res

    pf_d, _, _ = run("direct")
    pf_g, _, _ = run("gridded", engine='gridded', k_grid_shape=shape)
    agree = float(np.mean(np.abs(pf_g - pf_d) < 1e-6))
    out["peak_freq_agreement"] = agree
    log(f"peak-frequency agreement (exact bins): {agree:.4f}")
    with open(out_path, 'w') as f:
        json.dump(out, f, indent=1)
    log("done")


if __name__ == '__main__':
    main()
