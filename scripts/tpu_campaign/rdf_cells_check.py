"""TPU validation + throughput of the linked-cell g(r) path.

Three phases on the real chip:
  1. Parity: cells vs brute vs the f64 all-images oracle on a small
     random liquid (counts must match brute bin-for-bin — equality of
     the int histograms, not fp tolerance).
  2. Tile invariance: the cells checksum must be IDENTICAL across
     cell_block configs (the hardware-only accumulation-order hazard
     the verify notes call out).
  3. Throughput: brute vs cells at a liquid shape where the cell grid
     wins (N=1e5, r_max ≪ L) — records pairs/s and the speedup.

Writes rdf_cells_check.json.
"""
import json
import time
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "rdf_cells_check.json"


def _calc(pos, L):
    from psa_tpu import SEDCalculator
    from psa_tpu.core.trajectory import Trajectory, make_box_arrays
    n_t, n_a, _ = pos.shape
    box = np.diag([L] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    traj = Trajectory(pos.astype(np.float32), np.zeros_like(pos, np.float32),
                      np.ones(n_a, np.int32),
                      np.arange(n_t, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.05)
    return SEDCalculator(traj, nx=1, ny=1, nz=1)


def oracle(pos, L, r_max, n_bins):
    box = np.diag([L] * 3)
    shifts = np.array([[i, j, k] for i in (-1, 0, 1) for j in (-1, 0, 1)
                       for k in (-1, 0, 1)], dtype=np.float64) @ box.T
    n_t, n_a, _ = pos.shape
    edges = np.linspace(0, r_max, n_bins + 1)
    counts = np.zeros(n_bins)
    for t in range(n_t):
        d = pos[t, :, None, :].astype(np.float64) - pos[t, None, :, :]
        r = np.sqrt(((d[:, :, None, :] + shifts) ** 2).sum(-1)).min(-1)
        r[np.arange(n_a), np.arange(n_a)] = np.inf
        counts += np.histogram(r, bins=edges)[0]
    vol = L ** 3
    shell = 4 / 3 * np.pi * (edges[1:] ** 3 - edges[:-1] ** 3)
    return counts / (n_t * n_a * (n_a - 1) * shell / vol)


def main():
    res = {}
    rng = np.random.default_rng(21)

    # ---- parity (small) -------------------------------------------------
    pos = rng.uniform(0, 12.0, (3, 400, 3))
    calc = _calc(pos, 12.0)
    _, g_cells = calc.calculate_rdf(r_max=3.0, n_bins=30, method='cells')
    assert calc._last_rdf_method == 'cells'
    _, g_brute = calc.calculate_rdf(r_max=3.0, n_bins=30, method='brute')
    want = oracle(pos, 12.0, 3.0, 30)
    res['parity_cells_vs_brute_max_rel'] = float(
        np.abs(g_cells - g_brute).max() / max(g_brute.max(), 1e-30))
    res['parity_cells_vs_f64_max_rel'] = float(
        np.abs(g_cells - want).max() / max(want.max(), 1e-30))
    print("parity:", res, flush=True)
    assert res['parity_cells_vs_brute_max_rel'] < 1e-6
    assert res['parity_cells_vs_f64_max_rel'] < 1e-4

    # ---- tile invariance ------------------------------------------------
    sums = {}
    for cb in (16, 64, 256):
        _, g = calc.calculate_rdf(r_max=3.0, n_bins=30, method='cells',
                                  cell_block=cb)
        sums[cb] = float(np.float64(g).sum())
    res['checksums_by_cell_block'] = sums
    print("checksums:", sums, flush=True)
    assert len({f"{v:.10e}" for v in sums.values()}) == 1, sums

    # ---- throughput (liquid shape where cells win) ----------------------
    n_a, n_frames, L, r_max = 100_000, 4, 126.0, 6.0
    pos = rng.uniform(0, L, (n_frames, n_a, 3)).astype(np.float32)
    calc = _calc(pos, L)
    for method in ('brute', 'cells'):
        t0 = time.time()
        _, g = calc.calculate_rdf(r_max=r_max, n_bins=200, method=method)
        first = time.time() - t0
        t0 = time.time()
        _, g = calc.calculate_rdf(r_max=r_max, n_bins=200, method=method)
        warm = time.time() - t0
        pairs = n_frames * float(n_a) * (n_a - 1)
        res[method] = {'first_s': round(first, 2), 'warm_s': round(warm, 2),
                       'g_pairs_per_s': round(pairs / warm / 1e9, 2),
                       'g_sum': float(np.float64(g).sum())}
        print(method, res[method], flush=True)
    assert abs(res['brute']['g_sum'] - res['cells']['g_sum']) \
        < 1e-6 * abs(res['brute']['g_sum'])
    res['speedup_cells_over_brute'] = round(
        res['brute']['warm_s'] / res['cells']['warm_s'], 2)
    print("speedup:", res['speedup_cells_over_brute'], flush=True)

    OUT.write_text(json.dumps(res, indent=1))
    print("wrote", OUT, flush=True)


if __name__ == '__main__':
    main()
