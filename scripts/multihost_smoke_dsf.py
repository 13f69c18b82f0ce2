#!/usr/bin/env python
"""Two-process multi-controller smoke of the sharded DSF/liquid/timecorr
families (round-5 VERDICT item 5).

Launch (no args): spawns two workers that jax.distributed-initialize against
a local coordinator, each exposing 4 virtual CPU devices (8 global).  Each
worker writes an identical LAMMPS text dump, ingests it through
:class:`DumpBlockSource` (positions + velocities via the shared-parse
``sibling``) — the PER-PROCESS ingestion path VERDICT r4 flagged as
untested across a process boundary — and runs

    sharded_dsf, sharded_sk, sharded_isf, sharded_dsf_self,
    sharded_timecorr (msd + vacf)

over the global (t, a, k) mesh, checking every observable against its
single-process float64 oracle.  Exit code 0 = both workers passed.
"""
import os
import subprocess
import sys
import tempfile

WORKERS = 2
PORT = int(os.environ.get('PSA_MH_DSF_PORT', 12797))


def write_dump(traj, path):
    with open(path, 'w') as f:
        for t in range(traj.n_frames):
            f.write(f"ITEM: TIMESTEP\n{t}\nITEM: NUMBER OF ATOMS\n"
                    f"{traj.n_atoms}\n")
            f.write("ITEM: BOX BOUNDS pp pp pp\n")
            for d in range(3):
                f.write(f"0.0 {traj.box_matrix[d, d]:.8f}\n")
            f.write("ITEM: ATOMS id type x y z vx vy vz\n")
            for a in range(traj.n_atoms):
                p, v = traj.positions[t, a], traj.velocities[t, a]
                f.write(f"{a + 1} 1 {p[0]:.8f} {p[1]:.8f} {p[2]:.8f} "
                        f"{v[0]:.8f} {v[1]:.8f} {v[2]:.8f}\n")


def worker(rank: int) -> None:
    os.environ['XLA_FLAGS'] = (
        os.environ.get('XLA_FLAGS', '')
        + ' --xla_force_host_platform_device_count=4').strip()
    import jax
    jax.config.update('jax_platforms', 'cpu')
    jax.distributed.initialize(coordinator_address=f'localhost:{PORT}',
                               num_processes=WORKERS, process_id=rank)
    import numpy as np
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from psa_tpu.models import make_random_crystal_trajectory
    from psa_tpu.ops.instantaneous import commensurate_kpath
    from psa_tpu.parallel import (DumpBlockSource, make_mesh, sharded_dsf,
                                  sharded_dsf_self, sharded_isf, sharded_sk,
                                  sharded_timecorr)

    assert jax.process_count() == WORKERS
    assert jax.device_count() == 8 and jax.local_device_count() == 4

    traj = make_random_crystal_trajectory(n_cells_xyz=(4, 2, 2), basis=2,
                                          n_frames=16, dt_ps=0.02, seed=11)
    n_t, n_atoms = traj.n_frames, traj.n_atoms

    with tempfile.TemporaryDirectory() as td:
        dump = os.path.join(td, f"smoke_r{rank}.dump")
        write_dump(traj, dump)
        pos_src = DumpBlockSource(dump, field='positions')
        vel_src = pos_src.sibling('velocities')
        # dump round-trip is f32-lossy through text: oracle uses what the
        # mesh actually ingested
        pos, vel = pos_src._src.frames(0, n_t)
        pos64, vel64 = pos.astype(np.float64), vel.astype(np.float64)

        kv = np.outer(np.linspace(0.05, 1.6, 48), [1, 0, 0]).astype(np.float32)
        kv = commensurate_kpath(kv, traj.box_matrix)
        n_k = len(kv)
        mesh = make_mesh(shape=(2, 2, 2))
        freqs_all = np.fft.fftfreq(n_t, d=0.02)
        freq_idx = np.flatnonzero(freqs_all >= 0).astype(np.int32)

        # ---- f64 oracles on the ingested data -----------------------------
        phase = np.exp(1j * np.einsum('tac,kc->tak', pos64,
                                      kv.astype(np.float64)))
        rho = phase.sum(axis=1)                               # (n_t, K)
        j_modes = np.einsum('tac,tak->tkc', vel64, phase)     # (n_t, K, 3)
        rho_spec = np.fft.fft(rho, axis=0) / n_t
        j_spec = np.fft.fft(j_modes, axis=0) / n_t
        ku = kv / np.maximum(np.linalg.norm(kv, axis=1, keepdims=True), 1e-30)
        s_oracle = (np.abs(rho_spec[freq_idx]) ** 2) / n_atoms
        jl = np.einsum('fkc,kc->fk', j_spec[freq_idx], ku.astype(np.float64))
        cl_oracle = np.abs(jl) ** 2 / n_atoms
        ct_oracle = (np.sum(np.abs(j_spec[freq_idx]) ** 2, axis=-1)
                     - np.abs(jl) ** 2) / n_atoms
        sk_oracle = (np.abs(rho) ** 2).mean(axis=0) / n_atoms
        n_lags = 6
        isf_oracle = np.zeros((n_lags, n_k))
        for tau in range(n_lags):
            isf_oracle[tau] = np.real(
                np.conj(rho[:n_t - tau]) * rho[tau:]).mean(axis=0) / n_atoms
        self_spec = np.fft.fft(phase, axis=0) / n_t           # (n_t, A, K)
        ss_oracle = (np.abs(self_spec[freq_idx]) ** 2).sum(axis=1) / n_atoms
        msd_oracle = np.array([
            ((pos64[tau:] - pos64[:n_t - tau]) ** 2).sum(-1).mean(0).mean()
            for tau in range(n_lags)])
        vacf_oracle = np.array([
            (vel64[:n_t - tau] * vel64[tau:]).sum(-1).mean(0).mean()
            for tau in range(n_lags)])

        def check(name, got, want, tol=2e-5):
            got = np.asarray(got, dtype=np.float64)
            scale = max(np.abs(want).max(), 1e-12)
            err = np.abs(got - want).max() / scale
            assert err < tol, f"rank {rank}: {name} rel err {err:.2e}"
            return err

        errs = {}
        s, cl, ct = sharded_dsf(mesh, pos_src, vel_src, kv, freq_idx,
                                t_superchunk=8)
        errs['dsf'] = max(check('dsf S', s, s_oracle),
                          check('dsf CL', cl, cl_oracle),
                          check('dsf CT', ct, ct_oracle))
        errs['sk'] = check('sk', sharded_sk(mesh, pos_src, kv,
                                            t_superchunk=8), sk_oracle)
        errs['isf'] = check('isf', sharded_isf(mesh, pos_src, kv, n_lags,
                                               t_superchunk=8), isf_oracle)
        errs['dsf_self'] = check('dsf_self',
                                 sharded_dsf_self(mesh, pos_src, kv,
                                                  freq_idx), ss_oracle)
        errs['msd'] = check('msd', sharded_timecorr(mesh, pos_src, 'msd',
                                                    n_lags), msd_oracle)
        errs['vacf'] = check('vacf', sharded_timecorr(mesh, vel_src, 'vacf',
                                                      n_lags), vacf_oracle)
        pos_src.close()

    print(f"rank {rank}: OK ({'; '.join(f'{k} {v:.1e}' for k, v in errs.items())})",
          flush=True)


def main() -> int:
    procs = [subprocess.Popen([sys.executable, __file__, str(r)])
             for r in range(WORKERS)]
    rc = 0
    for p in procs:
        rc |= p.wait(timeout=600)
    print("multihost DSF smoke:", "PASS" if rc == 0 else f"FAIL rc={rc}")
    return rc


if __name__ == '__main__':
    if len(sys.argv) > 1:
        worker(int(sys.argv[1]))
    else:
        sys.exit(main())
