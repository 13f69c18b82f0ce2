"""Benchmark: the BASELINE.json single-chip target workload.

Coherent SED over a 50×50 k-grid (2,500 k-points) of a 10⁵-atom, 10⁴-step
trajectory — the workload BASELINE.json requires in < 10 s on one v5e chip at
≥ 50× the NumPy reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where value is
k-points/sec of the TPU SED engine and vs_baseline is the speedup over the
measured NumPy reference pipeline (reference formula exactly as in
sed_calculator.py:78-83 — linear in both n_k and n_t, so it is measured on a
subsample and extrapolated, with the measured s/k-point persisted to
scripts/tpu_campaign/numpy_baseline.json and reused across sessions).

Robustness contract (VERDICT r2 item 1 — the headline must land even on a
loaded host / slow remote-compile day):
  * SIGTERM/SIGINT handlers are installed at process start and emit the most
    recent measured headline (final, or provisional from the first completed
    k-block) before exiting;
  * the headline JSON line prints IMMEDIATELY after the timed sweep — the
    user-path extras run afterwards and write to stderr +
    scripts/tpu_campaign/bench_extras.json only;
  * synthetic velocities are generated ON DEVICE (jax.random.normal straight
    into HBM) — no 12 GB host generation or upload on the headline path;
  * the NumPy baseline is read from the sidecar when available; a missing
    entry is measured on an n_t-subsample and appended;
  * psa_tpu enables the persistent XLA compilation cache at import, so
    reruns skip the multi-minute first compile.

Timing methodology: compute is timed on device-held results with a scalar
checksum readback as the only trustworthy synchronization fence on this
remote runtime (block_until_ready can return at enqueue).

Environment knobs:
    PSA_BENCH_ATOMS   (default 100000)
    PSA_BENCH_STEPS   (default 10000)
    PSA_BENCH_GRID    (default 50 -> 50x50 k-points)
    PSA_BENCH_BASELINE_K (default 8; k-subsample for the NumPy reference pass)
    PSA_BENCH_BASELINE_T (default 1000; n_t-subsample for a fresh baseline)
    PSA_BENCH_PRECISION  (default 'parity'; or 'fast' for bf16 MXU passes)
    PSA_BENCH_EXTRAS  (default 0 — keep the driver capture lean; set 1
                       to run the user-facing path benches after the
                       headline, still under PSA_BENCH_BUDGET_S)
    PSA_BENCH_KBLOCK  (default 1280; k-points per compiled block)
    PSA_BENCH_BUDGET_S (default 3000; stop starting extras past this)
"""
import json
import os
import signal
import sys
import time

import numpy as np

_RUN_START = time.time()
_BASELINE_SIDECAR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'scripts', 'tpu_campaign',
                                 'numpy_baseline.json')
_EXTRAS_OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           'scripts', 'tpu_campaign', 'bench_extras.json')

#: Best-known headline; the signal handler emits this if the process is
#: killed before the normal print.  Set provisionally after the first timed
#: k-block, finally after the full sweep.
_STATE = {'headline': None, 'stage': 'startup', 'printed': False}


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _print_headline_once():
    if _STATE['headline'] is not None and not _STATE['printed']:
        _STATE['printed'] = True
        print(json.dumps(_STATE['headline']), flush=True)


def _signal_emit(signum, frame):
    log(f"signal {signum} during stage '{_STATE['stage']}' — emitting "
        f"{'headline' if _STATE['headline'] else 'nothing (no measurement yet)'}")
    _print_headline_once()
    os._exit(0 if _STATE['printed'] else 1)


signal.signal(signal.SIGTERM, _signal_emit)
signal.signal(signal.SIGINT, _signal_emit)


def si_mean_positions(n_atoms):
    """Si-like lattice mean positions, float64 (host; tiny)."""
    a0 = 5.43
    side = int(np.ceil((n_atoms / 8) ** (1 / 3)))  # 8-atom conventional cells
    cells = np.stack(np.meshgrid(*[np.arange(side)] * 3, indexing='ij'),
                     axis=-1).reshape(-1, 3)
    basis = np.array([[0, 0, 0], [0.25, 0.25, 0.25], [0.5, 0.5, 0], [0.75, 0.75, 0.25],
                      [0.5, 0, 0.5], [0.75, 0.25, 0.75], [0, 0.5, 0.5], [0.25, 0.75, 0.75]])
    sites = ((cells[:, None, :] + basis[None, :, :]).reshape(-1, 3) * a0)[:n_atoms]
    return sites.astype(np.float64)


def grid_k_vectors(grid):
    a0 = 5.43
    kx = np.linspace(-2 * np.pi / a0, 2 * np.pi / a0, grid, dtype=np.float32)
    return np.stack([np.repeat(kx, grid), np.tile(kx, grid),
                     np.zeros(grid * grid, np.float32)], axis=1)


def _numpy_ref_time(velocities, mean_pos32, kv):
    """One timed pass of the reference pipeline (float32 phase matrix +
    einsum + FFT/n_t) on the given data; returns seconds."""
    n_t, _, _ = velocities.shape
    k_sub = kv.shape[0]
    t0 = time.time()
    phase = np.exp(1j * np.dot(kv, mean_pos32.T))                 # (K, N) c64
    sed_tk = np.zeros((n_t, k_sub, 3), dtype=np.complex64)
    for pol in range(3):
        sed_tk[:, :, pol] = np.einsum('ta,ak->tk', velocities[:, :, pol],
                                      phase.T, optimize=True)
    _ = (np.fft.fft(sed_tk, axis=0) / n_t).astype(np.complex64)
    return time.time() - t0


def baseline_s_per_kpoint(n_atoms, n_steps, mean_pos64, k_vectors, k_sub,
                          t_sub):
    """Measured NumPy-reference seconds per k-point at (n_atoms, n_steps).

    The sidecar persists per-shape measurements so loaded-day reruns reuse a
    clean-host number instead of spending minutes re-measuring (VERDICT r2).
    A missing shape is measured on a t_sub-step subsample and extrapolated
    linearly in n_t (the einsum dominates and is exactly linear in n_t).
    """
    key = f"{n_atoms}x{n_steps}"
    try:
        with open(_BASELINE_SIDECAR) as f:
            sidecar = json.load(f)
    except (OSError, ValueError):
        sidecar = {}
    if key in sidecar:
        v = sidecar[key]['s_per_kpoint']
        log(f"numpy baseline from sidecar: {v:.3f} s/k-point "
            f"({sidecar[key].get('note', '')})")
        return v

    t_sub = min(t_sub, n_steps)
    log(f"numpy baseline not cached for {key}; measuring on a {t_sub}-step "
        f"subsample x {k_sub} k-points...")
    rng = np.random.default_rng(0)
    t0 = time.time()
    vel_sub = rng.standard_normal((t_sub, n_atoms, 3), dtype=np.float32)
    log(f"  host velocities subsample generated in {time.time() - t0:.1f}s")
    dt = _numpy_ref_time(vel_sub, mean_pos64.astype(np.float32),
                         k_vectors[:k_sub])
    s_per_k = dt / k_sub * (n_steps / t_sub)
    log(f"  {k_sub} k-points x {t_sub} steps in {dt:.1f}s -> "
        f"{s_per_k:.3f} s/k-point extrapolated to n_t={n_steps}")
    sidecar[key] = {
        's_per_kpoint': round(s_per_k, 4),
        'note': f"measured on t_sub={t_sub} x k_sub={k_sub}, extrapolated "
                f"linearly in n_t",
    }
    try:
        os.makedirs(os.path.dirname(_BASELINE_SIDECAR), exist_ok=True)
        with open(_BASELINE_SIDECAR, 'w') as f:
            json.dump(sidecar, f, indent=1, sort_keys=True)
    except OSError as e:
        log(f"  (sidecar not writable: {e})")
    return s_per_k


def main():
    n_atoms = int(os.environ.get('PSA_BENCH_ATOMS', 100_000))
    n_steps = int(os.environ.get('PSA_BENCH_STEPS', 10_000))
    grid = int(os.environ.get('PSA_BENCH_GRID', 50))
    k_sub = int(os.environ.get('PSA_BENCH_BASELINE_K', 8))
    t_sub = int(os.environ.get('PSA_BENCH_BASELINE_T', 1000))
    precision = os.environ.get('PSA_BENCH_PRECISION', 'parity')

    _STATE['stage'] = 'mean positions'
    mean_pos64 = si_mean_positions(n_atoms)
    k_vectors = grid_k_vectors(grid)
    n_k = k_vectors.shape[0]

    # ---- NumPy reference baseline (sidecar, or subsampled measurement) ----
    _STATE['stage'] = 'numpy baseline'
    ref_s_per_k = baseline_s_per_kpoint(n_atoms, n_steps, mean_pos64,
                                        k_vectors, k_sub, t_sub)

    # ---- TPU path -------------------------------------------------------
    _STATE['stage'] = 'jax import'
    import jax
    import jax.numpy as jnp
    from psa_tpu.ops import spectral    # enables the persistent compile cache

    log(f"devices: {jax.devices()}")
    log(f"compile cache: {jax.config.jax_compilation_cache_dir}")
    mp_hi, mp_lo = spectral.split_f64(mean_pos64)

    # Velocities are synthesized ON DEVICE, straight into HBM: the 12 GB
    # host generation (~6 min on a loaded day) and upload (~3.5 min on this
    # tunnel) were the bench's biggest failure window (VERDICT r2 item 1).
    _STATE['stage'] = 'device synth'
    t0 = time.time()
    data_dev = jax.jit(
        lambda key: jax.random.normal(key, (n_steps, n_atoms, 3),
                                      dtype=jnp.float32))(jax.random.key(0))
    hi_dev = jax.device_put(mp_hi)
    lo_dev = jax.device_put(mp_lo)
    jax.block_until_ready((data_dev, hi_dev, lo_dev))
    log(f"device-side synth of {n_steps * n_atoms * 3 * 4 / 1e9:.1f} GB + "
        f"mean-pos upload in {time.time() - t0:.1f}s")

    # Block size: keep (data + table + projections + outputs) inside HBM.
    block = int(os.environ.get('PSA_BENCH_KBLOCK', 1280))
    n_blocks = (n_k + block - 1) // block
    k_padded = np.zeros((n_blocks * block, 3), dtype=np.float32)
    k_padded[:n_k] = k_vectors
    k_blocks = [jnp.asarray(k_padded[i * block:(i + 1) * block])
                for i in range(n_blocks)]

    # On some remote TPU runtimes block_until_ready returns at enqueue, so
    # the only trustworthy timing fence is a scalar readback whose value
    # depends on every output.  Pre-compile both programs, then time
    # enqueue-all + checksum readback.
    @jax.jit
    def _checksum(acc, re, im):
        return acc + re[0, 0, 0] + im[-1, -1, -1] + re[-1, -1, -1]

    _STATE['stage'] = 'compile'
    t0 = time.time()
    out = spectral.sed_spectrum(data_dev, hi_dev, lo_dev, k_blocks[0],
                                precision=precision)
    acc = _checksum(jnp.float32(0), *out)
    _ = float(acc)
    compile_s = time.time() - t0
    log(f"compile+first block: {compile_s:.1f}s")
    del out

    def headline_dict(kps, speedup, note=''):
        # compile_s documents the capture's cache state: ~seconds when the
        # persistent XLA cache hit, minutes on a cold container (VERDICT r3
        # item 8 — the capture itself records cold-vs-warm).
        return {
            "metric": f"k-points/sec, coherent SED, {grid}x{grid} grid, "
                      f"{n_atoms} atoms x {n_steps} steps, "
                      f"precision={precision}{note}",
            "value": round(kps, 2),
            "unit": "k-points/sec",
            "vs_baseline": round(speedup, 2),
            "compile_s": round(compile_s, 1),
        }

    # timed sweep over all blocks (results stay device-side, like any fused
    # downstream pipeline; the closing scalar readback costs ~0.15s on this
    # tunnel and is included)
    _STATE['stage'] = 'timed sweep'
    t0 = time.time()
    acc = jnp.float32(0)
    for i, kb in enumerate(k_blocks):
        out = spectral.sed_spectrum(data_dev, hi_dev, lo_dev, kb,
                                    precision=precision)
        acc = _checksum(acc, *out)
        del out
        if i == 0 and n_blocks > 1:
            # Provisional headline from the first completed block: the
            # emit-on-signal value if the sweep itself is interrupted.
            part = float(acc)  # sync fence for block 0
            dt0 = time.time() - t0
            kps0 = block / dt0
            _STATE['headline'] = headline_dict(
                kps0, ref_s_per_k * block / dt0,
                note=", provisional (first block only)")
    checksum = float(acc)  # hard synchronization point
    sweep_s = time.time() - t0
    log(f"checksum: {checksum:.6g}")

    kps = n_k / sweep_s
    ref_total = ref_s_per_k * n_k
    speedup = ref_total / sweep_s
    log(f"TPU sweep: {n_k} k-points ({n_atoms} atoms x {n_steps} steps) "
        f"in {sweep_s:.2f}s -> {kps:.1f} k-points/s")
    log(f"numpy reference extrapolated: {ref_total:.1f}s -> speedup {speedup:.1f}x")

    # The headline prints NOW — before the extras, which re-jit several
    # user-facing programs and can take many minutes on a remote-compile
    # runtime (they killed the round-2 driver capture).
    _STATE['headline'] = headline_dict(kps, speedup)
    # Dual headline (VERDICT r4 item 6): the end-to-end user path rides the
    # SAME device-resident data; on failure or PSA_BENCH_USER_HEADLINE=0 the
    # op-level headline still prints (the signal handler emits it if this
    # measurement is interrupted).
    if os.environ.get('PSA_BENCH_USER_HEADLINE', '1') not in ('', '0'):
        _STATE['stage'] = 'user headline'
        try:
            del k_blocks
            _STATE['headline']['headline_user'] = measure_user_headline(
                mean_pos64, n_steps, k_vectors, grid, precision,
                data_dev, hi_dev, lo_dev)
        except Exception as e:
            log(f"user headline failed: {type(e).__name__}: {e}")
    _print_headline_once()
    _STATE['stage'] = 'extras'

    extras = {}
    if os.environ.get('PSA_BENCH_EXTRAS', '0') not in ('', '0'):
        data_dev = hi_dev = lo_dev = k_blocks = None  # free HBM for extras
        budget_s = float(os.environ.get('PSA_BENCH_BUDGET_S', 3000))
        deadline = _RUN_START + budget_s
        try:
            extras = user_path_benches(mean_pos64, n_steps, k_vectors,
                                       grid, precision, deadline)
        except Exception as e:  # the headline already printed; just log
            log(f"user-path benches failed: {type(e).__name__}: {e}")
        if extras:
            try:
                with open(_EXTRAS_OUT, 'w') as f:
                    json.dump({"shape": f"{n_atoms}x{n_steps}x{grid}",
                               "precision": precision, **extras}, f, indent=1)
                log(f"extras written to {_EXTRAS_OUT}: "
                    f"{json.dumps(extras)}")
            except OSError as e:
                log(f"extras not persisted: {e}")


def measure_user_headline(mean_pos64, n_steps, k_vectors, grid, precision,
                          data_dev, hi_dev, lo_dev):
    """End-to-end USER-PATH headline (VERDICT r4 item 6): the same bench
    shape through the public ``calculate_kgrid_peaks`` — compile, chunking,
    device dispatch, readback and all — so the recorded JSON carries what a
    user reproduces, next to the op-level sweep.

    Reuses the op sweep's device-resident data via
    ``preload_device_group_data`` (zero extra upload; the positions/
    velocities host arrays are zero-strided broadcast views the preloaded
    cache entry preempts)."""
    from psa_tpu.core.calculator import SEDCalculator
    from psa_tpu.core.trajectory import Trajectory, make_box_arrays
    n_atoms = mean_pos64.shape[0]
    side = float(np.max(mean_pos64)) + 5.43
    box = np.diag([side] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    mp32 = mean_pos64.astype(np.float32)
    positions = np.broadcast_to(mp32[None], (n_steps, n_atoms, 3))
    velocities = np.broadcast_to(np.zeros(3, np.float32),
                                 (n_steps, n_atoms, 3))
    traj = Trajectory(positions, velocities, np.ones(n_atoms, dtype=np.int32),
                      np.arange(n_steps, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)
    calc = SEDCalculator(traj, nx=1, ny=1, nz=1, precision=precision,
                         max_device_bytes=int(13e9))
    calc._mean_pos64 = mean_pos64            # skip the broadcast-mean pass
    calc.preload_device_group_data(data_dev, hi_dev, lo_dev)
    n_k = k_vectors.shape[0]
    t0 = time.time()
    calc.calculate_kgrid_peaks(k_vectors, n_peaks=3, k_chunk_size=1280)
    first_s = time.time() - t0
    t0 = time.time()
    calc.calculate_kgrid_peaks(k_vectors, n_peaks=3, k_chunk_size=1280)
    warm_s = time.time() - t0
    log(f"user headline: calculate_kgrid_peaks {warm_s:.2f}s warm "
        f"({n_k / warm_s:.1f} k-points/s; first incl. compile {first_s:.1f}s)")
    return {
        "metric": f"k-points/sec, calculate_kgrid_peaks end-to-end, "
                  f"{grid}x{grid} grid, {n_atoms} atoms x {n_steps} steps, "
                  f"precision={precision}",
        "value": round(n_k / warm_s, 2),
        "unit": "k-points/sec",
        "first_s": round(first_s, 1),
    }


def host_velocities(n_steps, n_atoms):
    """Fast host-side synthetic velocities for the extras' Trajectory.

    Tiles a 2²⁰-sample normal pool with per-row offsets: statistically fine
    for throughput benches (SED rates are data-independent) at memcpy speed
    instead of minutes of RNG (the round-2 failure mode)."""
    t0 = time.time()
    rng = np.random.default_rng(1)
    pool = rng.standard_normal(1 << 20, dtype=np.float32)
    total = n_steps * n_atoms * 3
    flat = np.lib.stride_tricks.sliding_window_view(
        np.tile(pool, 2), pool.size)  # cheap shifted views
    out = np.empty(total, dtype=np.float32)
    written = 0
    step = pool.size
    i = 0
    while written < total:
        n = min(step, total - written)
        out[written:written + n] = flat[(i * 7919) % pool.size][:n]
        written += n
        i += 1
    out = out.reshape(n_steps, n_atoms, 3)
    log(f"host velocities (tiled pool) in {time.time() - t0:.1f}s")
    return out


def user_path_benches(mean_pos64, n_steps, k_vectors, grid, precision,
                      deadline=float('inf')):
    """End-to-end SEDCalculator paths (what library/GUI users actually call).

    Runs AFTER the headline has printed; results go to stderr and the extras
    sidecar.  Phases that would START after ``deadline`` are skipped."""
    from psa_tpu.core.calculator import SEDCalculator
    from psa_tpu.core.trajectory import Trajectory, make_box_arrays

    n_atoms = mean_pos64.shape[0]
    velocities = host_velocities(n_steps, n_atoms)
    # broadcast view: zero extra host memory for positions (the engine only
    # reads their time-mean; velocities drive the SED)
    positions = np.broadcast_to(mean_pos64.astype(np.float32),
                                (n_steps, n_atoms, 3))
    side = float(np.max(mean_pos64)) + 5.43
    box = np.diag([side] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    traj = Trajectory(positions, velocities, np.ones(n_atoms, dtype=np.int32),
                      np.arange(n_steps, dtype=np.float32), box_matrix=box,
                      box_lengths=lengths, box_tilts=tilts, dt_ps=0.01)
    calc = SEDCalculator(traj, nx=1, ny=1, nz=1, precision=precision,
                         max_device_bytes=int(13e9))
    extras = {}

    def over_budget(phase):
        if time.time() > deadline:
            log(f"skipping {phase}: past PSA_BENCH_BUDGET_S")
            return True
        return False

    # -- GUI-default grid browse: on-device reduction, filtered d2h ---------
    n_k = k_vectors.shape[0]
    if over_budget("user-path extras"):
        return extras
    log("user path 1/5: calculate_kgrid_browse (on-device reduction)...")
    t0 = time.time()
    freqs, inten, _ = calc.calculate_kgrid_browse(k_vectors, k_chunk_size=1280)
    dt = time.time() - t0
    warm0 = time.time()
    freqs, inten, _ = calc.calculate_kgrid_browse(k_vectors, k_chunk_size=1280)
    warm = time.time() - warm0
    full_bytes = n_steps * n_k * 3 * 8
    browse_bytes = inten.nbytes
    extras["calculate_browse_kps"] = round(n_k / warm, 2)
    extras["browse_d2h_reduction"] = round(full_bytes / browse_bytes, 1)
    log(f"  browse: {warm:.2f}s warm ({n_k / warm:.1f} k-points/s; first call "
        f"incl. compile {dt:.1f}s); d2h {browse_bytes/1e6:.0f} MB vs "
        f"{full_bytes/1e9:.1f} GB full complex = {full_bytes/browse_bytes:.0f}x less")

    # -- same browse with the opt-in f16 display readback -------------------
    if over_budget("browse f16 bench"):
        return extras
    log("user path 1b/5: browse with readback_dtype='float16' (opt-in)...")
    t0 = time.time()
    _, inten16, _ = calc.calculate_kgrid_browse(k_vectors, k_chunk_size=1280,
                                                readback_dtype='float16')
    dt16 = time.time() - t0
    warm0 = time.time()
    _, inten16, _ = calc.calculate_kgrid_browse(k_vectors, k_chunk_size=1280,
                                                readback_dtype='float16')
    warm16 = time.time() - warm0
    q_err = float(np.max(np.abs(inten16.astype(np.float64) -
                                inten.astype(np.float64))) /
                  max(float(np.max(inten)), 1e-300))
    extras["calculate_browse_f16_kps"] = round(n_k / warm16, 2)
    extras["browse_f16_speedup"] = round(warm / warm16, 2)
    extras["browse_f16_max_quant_err"] = q_err
    log(f"  browse f16: {warm16:.2f}s warm ({n_k / warm16:.1f} k-points/s, "
        f"{warm / warm16:.2f}x vs f32; first {dt16:.1f}s; "
        f"max quantization {q_err:.2e} of max)")

    # -- library default: k-path calculate with full complex readback -------
    if over_budget("k-path calculate bench"):
        return extras
    log("user path 2/5: calculate() on a 250-point k-path...")
    k_mags, k_vecs_path = calc.get_k_path('x', bz_coverage=1.0, n_k=250,
                                          lat_param=5.43)
    t0 = time.time()
    sed = calc.calculate(k_mags, k_vecs_path, k_chunk_size=1280)
    dt = time.time() - t0
    t0 = time.time()
    sed = calc.calculate(k_mags, k_vecs_path, k_chunk_size=1280)
    warm = time.time() - t0
    extras["kpath_calculate_kps"] = round(250 / warm, 2)
    log(f"  k-path calculate: {warm:.2f}s warm ({250 / warm:.1f} k-points/s; "
        f"first {dt:.1f}s; {sed.sed.nbytes/1e6:.0f} MB complex fetched)")

    # -- on-device peak extraction: tiny readback, ~device-side rate --------
    if over_budget("peaks bench"):
        return extras
    log("user path 3/5: calculate_kgrid_peaks (on-device dispersion surface)...")
    try:
        t0 = time.time()
        calc.calculate_kgrid_peaks(k_vectors, n_peaks=3, k_chunk_size=1280)
        dt = time.time() - t0
        t0 = time.time()
        pk = calc.calculate_kgrid_peaks(k_vectors, n_peaks=3, k_chunk_size=1280)
        warm = time.time() - t0
        extras["peaks_kps"] = round(n_k / warm, 2)
        log(f"  peaks: {warm:.2f}s warm ({n_k / warm:.1f} k-points/s; "
            f"first {dt:.1f}s; {sum(p.nbytes for p in pk)/1e3:.0f} kB fetched)")
    except Exception as e:
        log(f"  peaks bench failed: {type(e).__name__}: {e}")

    if over_budget("gridded browse bench"):
        return extras
    log("user path 4/5: calculate_kgrid_browse(engine='gridded') — fused "
        "NUFFT with device-built weights + on-device FFT/reduction...")
    try:
        t0 = time.time()
        calc.calculate_kgrid_browse(k_vectors, engine='gridded',
                                    k_grid_shape=(grid, grid))
        dt = time.time() - t0
        t0 = time.time()
        calc.calculate_kgrid_browse(k_vectors, engine='gridded',
                                    k_grid_shape=(grid, grid))
        warm = time.time() - t0
        extras["gridded_browse_kps"] = round(n_k / warm, 2)
        log(f"  gridded browse: {warm:.2f}s warm ({n_k / warm:.1f} k-points/s; "
            f"first {dt:.1f}s)")
    except Exception as e:
        log(f"  gridded browse bench failed: {type(e).__name__}: {e}")

    # -- gridded peaks: the measured-best dispersion-surface path -----------
    if over_budget("gridded peaks bench"):
        return extras
    log("user path 5/5: calculate_kgrid_peaks(engine='gridded')...")
    try:
        t0 = time.time()
        calc.calculate_kgrid_peaks(k_vectors, n_peaks=3, engine='gridded',
                                   k_grid_shape=(grid, grid))
        dt = time.time() - t0
        t0 = time.time()
        calc.calculate_kgrid_peaks(k_vectors, n_peaks=3, engine='gridded',
                                   k_grid_shape=(grid, grid))
        warm = time.time() - t0
        extras["gridded_peaks_kps"] = round(n_k / warm, 2)
        log(f"  gridded peaks: {warm:.2f}s warm ({n_k / warm:.1f} "
            f"k-points/s; first {dt:.1f}s)")
    except Exception as e:
        log(f"  gridded peaks bench failed: {type(e).__name__}: {e}")
    return extras


if __name__ == "__main__":
    main()
