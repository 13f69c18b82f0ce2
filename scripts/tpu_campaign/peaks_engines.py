#!/usr/bin/env python
"""TPU head-to-head: dispersion-surface extraction through both engines.

The peaks readback (1.4 MB at 200²) is ~150× smaller than the browse
planes, so this is the first end-to-end comparison where the gridded
engine's ~Gx/12 FLOP cut is not buried under d2h time.  Direct-peaks
measured 8,411 k-points/s end-to-end earlier (97% of its device rate);
whatever gridded-peaks measures here IS the engine's true relative speed.

Workload: N=1e5, n_t=2500, 200² grid, parity precision, warm × 2 reps.
"""
import json
import sys
import time

import numpy as np
import jax

sys.path.insert(0, '/root/repo')
from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays


def log(msg):
    print(msg, flush=True)


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    import os
    n_atoms = int(os.environ.get('PSA_PEAKS_ATOMS', 100_000))
    n_t = int(os.environ.get('PSA_PEAKS_STEPS', 2500))
    a0 = 5.43
    side = int(np.ceil((n_atoms / 8) ** (1 / 3)))
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                     axis=-1).reshape(-1, 3)
    basis = np.array([[0, 0, 0], [.25, .25, .25], [.5, .5, 0], [.75, .75, .25],
                      [.5, 0, .5], [.75, .25, .75], [0, .5, .5], [.25, .75, .75]])
    sites = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a0)[:n_atoms]
    vel = rng.standard_normal((n_t, n_atoms, 3), dtype=np.float32)
    positions = np.broadcast_to(sites.astype(np.float32), (n_t, n_atoms, 3))
    box = np.diag([sites.max() + a0] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    traj = Trajectory(positions, vel, np.ones(n_atoms, dtype=np.int32),
                      np.arange(n_t, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)
    calc = SEDCalculator(traj, nx=side, ny=side, nz=side)

    g = 200
    _, k_vecs, shape = calc.get_k_grid('xy', (-5.0, 5.0), (-5.0, 5.0), g, g)
    out = {"config": {"atoms": n_atoms, "steps": n_t, "grid": g}, "runs": []}

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
        with open('/root/repo/scripts/tpu_campaign/peaks_engines.json',
                  'w') as f:
            json.dump(out, f, indent=1)
        return res

    pf_d, _, _ = run("direct")
    pf_g, _, _ = run("gridded", engine='gridded', k_grid_shape=shape)
    agree = float(np.mean(np.abs(pf_g - pf_d) < 1e-6))
    out["peak_freq_agreement"] = agree
    log(f"peak-frequency agreement (exact bins): {agree:.4f}")
    with open('/root/repo/scripts/tpu_campaign/peaks_engines.json', 'w') as f:
        json.dump(out, f, indent=1)
    log("done")


if __name__ == '__main__':
    main()
