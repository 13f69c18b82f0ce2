"""Instantaneous-phase observables: dynamic structure factor + currents.

Net-new capability (the reference projects only onto static mean-position
phases, sed_calculator.py:78-83).  Oracles:

* float64 NumPy direct evaluation of the defining formulas on the same f32
  inputs (parity ≤ 1e-6 of max, with km-scale coordinate offsets stressing
  the Cody-Waite folding);
* Parseval identities pinning the normalization convention:
  Σ_ω S(k,ω) = S(k) and Σ_ω S_s(k,ω) = 1 exactly;
* physics: Bragg condition on a static lattice, C_L peaks on the chain
  dispersion, and the harmonic small-displacement limit where
  N·(C_L + C_T) reduces to the SED intensity.
"""
import numpy as np
import pytest

from psa_tpu.core.calculator import SEDCalculator
from psa_tpu.core.trajectory import Trajectory, make_box_arrays
from psa_tpu.models import make_chain_trajectory
from psa_tpu.ops import instantaneous, spectral


def _traj(positions, velocities, box_edge, dt_ps=0.02):
    n_frames, n_atoms = positions.shape[:2]
    box = np.diag([box_edge] * 3).astype(np.float32)
    lengths, tilts = make_box_arrays(box)
    return Trajectory(positions=positions.astype(np.float32),
                      velocities=velocities.astype(np.float32),
                      types=np.ones(n_atoms, dtype=np.int32),
                      timesteps=np.arange(n_frames, dtype=np.float32),
                      box_matrix=box, box_lengths=lengths, box_tilts=tilts,
                      dt_ps=dt_ps)


def dsf_oracle(pos_f32, vel_f32, k_vecs, keep_all=False):
    """float64 direct evaluation of S, C_L, C_T on the module's convention."""
    pos = pos_f32.astype(np.float64)
    vel = vel_f32.astype(np.float64)
    n_t, n_a = pos.shape[:2]
    ang = np.einsum('tac,kc->tak', pos, k_vecs.astype(np.float64))
    ph = np.exp(1j * ang)
    rho_w = np.fft.fft(ph.sum(axis=1), axis=0) / n_t                 # (T, K)
    j = np.einsum('tac,tak->tkc', vel, ph)
    j_w = np.fft.fft(j, axis=0) / n_t                                # (T, K, 3)
    s = np.abs(rho_w) ** 2 / n_a
    ku = spectral.unit_k_vectors(k_vecs).astype(np.float64)
    jl = np.einsum('tkc,kc->tk', j_w, ku)
    c_l = np.abs(jl) ** 2 / n_a
    c_t = (np.sum(np.abs(j_w) ** 2, axis=-1) - np.abs(jl) ** 2) / n_a
    return s, c_l, c_t


class TestOracleParity:
    def test_f64_parity_with_large_offsets(self):
        """S/C_L/C_T match the f64 direct formulas on the same f32 inputs,
        with coordinates offset to thousands of Å (folding stress)."""
        rng = np.random.default_rng(7)
        n_t, n_a = 32, 9
        pos = (rng.uniform(0, 12, (n_t, n_a, 3)) + 4000.0).astype(np.float32)
        vel = rng.standard_normal((n_t, n_a, 3)).astype(np.float32)
        traj = _traj(pos, vel, box_edge=12.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = np.array([[0.7, 0, 0], [0, 1.3, 0], [0.4, 0.4, 0.2],
                       [0, 0, 0], [2.1, -0.9, 0.5]], dtype=np.float32)
        freqs, s, c_l, c_t = calc.calculate_dsf(kv, k_chunk_size=2)
        so, clo, cto = dsf_oracle(pos, vel, kv)
        mask = spectral.fftfreq_thz(n_t, traj.dt_ps) >= 0
        for got, want in ((s, so), (c_l, clo), (c_t, cto)):
            ref = want[mask]
            assert np.abs(got - ref).max() <= 1e-6 * max(ref.max(), 1.0)

    def test_self_part_f64_parity(self):
        rng = np.random.default_rng(3)
        n_t, n_a = 16, 5
        pos = (rng.uniform(0, 8, (n_t, n_a, 3)) + 1500.0).astype(np.float32)
        traj = _traj(pos, np.zeros_like(pos), box_edge=8.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = np.array([[0.9, 0.2, 0], [0, 0, 1.4]], dtype=np.float32)
        freqs, s_s = calc.calculate_dsf_self(kv, k_chunk_size=1)
        ang = np.einsum('tac,kc->tak', pos.astype(np.float64),
                        kv.astype(np.float64))
        spec = np.fft.fft(np.exp(1j * ang), axis=0) / n_t
        want = (np.abs(spec) ** 2).sum(axis=1) / n_a
        mask = spectral.fftfreq_thz(n_t, traj.dt_ps) >= 0
        assert np.abs(s_s - want[mask]).max() <= 1e-6

    def test_basis_selects_atoms(self):
        rng = np.random.default_rng(11)
        n_t, n_a = 8, 6
        pos = rng.uniform(0, 5, (n_t, n_a, 3)).astype(np.float32)
        vel = rng.standard_normal((n_t, n_a, 3)).astype(np.float32)
        traj = _traj(pos, vel, box_edge=5.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = np.array([[1.1, 0, 0]], dtype=np.float32)
        idx = [0, 2, 5]
        _, s, _, _ = calc.calculate_dsf(kv, basis_atom_indices=idx)
        so, _, _ = dsf_oracle(pos[:, idx], vel[:, idx], kv)
        mask = spectral.fftfreq_thz(n_t, traj.dt_ps) >= 0
        assert np.abs(s - so[mask]).max() <= 1e-6 * max(so.max(), 1.0)


class TestParsevalConventions:
    def test_sum_over_all_omega_is_static_structure_factor(self):
        """Σ_ω S(k,ω) = S(k) = ⟨|ρ_k|²⟩/N (ops level, all rows kept)."""
        rng = np.random.default_rng(1)
        import jax.numpy as jnp
        n_t, n_a, n_k = 16, 7, 3
        pos = rng.uniform(0, 9, (n_t, n_a, 3)).astype(np.float32)
        kv = rng.uniform(-2, 2, (n_k, 3)).astype(np.float32)
        mask = np.ones(n_a, dtype=np.float32)
        re, im = instantaneous.instant_modes_scan(
            jnp.asarray(pos), jnp.zeros_like(jnp.asarray(pos)),
            jnp.asarray(mask), jnp.asarray(kv), t_chunk=8)
        s, _, _ = instantaneous.dsf_reduce(
            re, im, jnp.asarray(spectral.unit_k_vectors(kv)),
            jnp.arange(n_t, dtype=np.int32), n_t)
        s_sum = np.asarray(s).sum(axis=0) / n_a
        ang = np.einsum('tac,kc->tak', pos.astype(np.float64),
                        kv.astype(np.float64))
        rho = np.exp(1j * ang).sum(axis=1)
        s_k = (np.abs(rho) ** 2).mean(axis=0) / n_a
        np.testing.assert_allclose(s_sum, s_k, rtol=1e-5)

    def test_self_part_sums_to_one(self):
        import jax.numpy as jnp
        rng = np.random.default_rng(2)
        n_t, n_a = 12, 4
        pos = rng.uniform(0, 6, (n_t, n_a, 3)).astype(np.float32)
        kv = np.array([[0.8, -0.3, 1.1]], dtype=np.float32)
        s_s = np.asarray(instantaneous.dsf_self_block(
            jnp.asarray(pos), jnp.ones(n_a, dtype=jnp.float32),
            jnp.asarray(kv), jnp.arange(n_t, dtype=np.int32))) / n_a
        np.testing.assert_allclose(s_s.sum(axis=0), 1.0, rtol=1e-6)


class TestPhysics:
    def test_bragg_peak_on_static_lattice(self):
        """Static chain, k = reciprocal-lattice vector: all the weight is
        S(G, ω=0) = N; at half-integer k the lattice sum vanishes."""
        a0, n_cells, n_t = 2.0, 8, 16
        x = np.arange(n_cells, dtype=np.float64) * a0
        pos0 = np.zeros((n_cells, 3))
        pos0[:, 0] = x
        pos = np.broadcast_to(pos0, (n_t, n_cells, 3)).copy()
        traj = _traj(pos, np.zeros_like(pos), box_edge=n_cells * a0)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        g = 2 * np.pi / a0
        # box-commensurate, non-reciprocal k (m=3 of 8): Σ_j e^{i2π·3j/8} = 0
        kv = np.array([[g, 0, 0], [2 * np.pi * 3 / (n_cells * a0), 0, 0]],
                      dtype=np.float32)
        freqs, s, _, _ = calc.calculate_dsf(kv)
        assert abs(s[0, 0] - n_cells) <= 1e-4 * n_cells   # Bragg: S = N at ω=0
        assert s[1:, 0].max() <= 1e-6 * n_cells           # static: no ω ≠ 0
        assert s[:, 1].max() <= 1e-4                      # destructive sum

    def test_current_spectrum_peaks_on_chain_dispersion(self):
        """Commensurate k on a vibrating chain: C_L peaks at
        ν = ν_max|sin(ka/2)| and the transverse plane is empty (motion ∥ x)."""
        traj = make_chain_trajectory(n_cells=16, n_frames=128, dt_ps=0.02,
                                     a=2.5, omega_max_thz=8.0, seed=5)
        calc = SEDCalculator(traj, nx=16, ny=1, nz=1)
        a0 = 2.5
        m = np.array([2, 5, 8])                           # commensurate modes
        kv = np.zeros((len(m), 3), dtype=np.float32)
        kv[:, 0] = 2 * np.pi * m / (16 * a0)
        kv = instantaneous.nearest_commensurate(kv, traj.box_lengths)
        freqs, s, c_l, c_t = calc.calculate_dsf(kv)
        nu_pred = 8.0 * np.abs(np.sin(kv[:, 0] * a0 / 2))
        for col in range(len(m)):
            nu_meas = freqs[np.argmax(c_l[:, col])]
            assert abs(nu_meas - nu_pred[col]) <= 0.5     # within ~1 bin
        assert c_t.max() <= 1e-8 * c_l.max()

    def test_harmonic_limit_matches_sed_intensity(self):
        """Displacements → 0 with velocities fixed: N·(C_L + C_T) reduces to
        the SED intensity exactly (the instantaneous phases degenerate to
        the static mean-position phases)."""
        base = make_chain_trajectory(n_cells=10, n_frames=64, dt_ps=0.02,
                                     a=2.5, omega_max_thz=6.0, seed=9)
        mean = base.positions.mean(axis=0, dtype=np.float64)
        eps = 1e-6
        pos = (mean[None] + eps * (base.positions.astype(np.float64)
                                   - mean[None])).astype(np.float32)
        traj = Trajectory(positions=pos, velocities=base.velocities,
                          types=base.types, timesteps=base.timesteps,
                          box_matrix=base.box_matrix,
                          box_lengths=base.box_lengths,
                          box_tilts=base.box_tilts, dt_ps=base.dt_ps)
        calc = SEDCalculator(traj, nx=10, ny=1, nz=1)
        km, kv = calc.get_k_path('x', bz_coverage=0.5, n_k=6)
        freqs, _, c_l, c_t = calc.calculate_dsf(kv.astype(np.float32))
        sed = calc.calculate(km, kv)
        mask = sed.freqs >= 0
        inten = sed.intensity[mask]
        got = traj.n_atoms * (c_l + c_t)
        assert np.abs(got - inten).max() <= 2e-3 * inten.max()


class TestStaticStructureFactor:
    def test_matches_f64_oracle_and_parseval(self):
        rng = np.random.default_rng(9)
        n_t, n_a = 24, 11
        pos = rng.uniform(0, 9, (n_t, n_a, 3)).astype(np.float32)
        traj = _traj(pos, rng.normal(size=(n_t, n_a, 3)).astype(np.float32),
                     box_edge=9.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = instantaneous.nearest_commensurate(
            rng.uniform(-2, 2, (5, 3)).astype(np.float32), traj.box_lengths)
        sk = calc.calculate_sk(kv)
        ang = np.einsum('tac,kc->tak', pos.astype(np.float64),
                        kv.astype(np.float64))
        rho = np.exp(1j * ang).sum(axis=1)
        oracle = (np.abs(rho) ** 2).mean(axis=0) / n_a
        np.testing.assert_allclose(sk, oracle, rtol=1e-5)
        # Parseval: equals Σ over ALL ω rows of S(k,ω) = Σ_{ω≥0} + Σ_{ω<0}
        freqs_all = spectral.fftfreq_thz(n_t, traj.dt_ps)
        _, s_plane, _, _ = calc.calculate_dsf(kv)
        neg = dsf_oracle(pos, np.zeros_like(pos), kv)[0][freqs_all < 0]
        np.testing.assert_allclose(sk, s_plane.sum(axis=0) + neg.sum(axis=0),
                                   rtol=1e-4)

    def test_bragg_and_ideal_gas_limits(self):
        """Static crystal: S(G) = N, destructive k ≈ 0; uncorrelated
        uniform positions: S(k) ≈ 1 at box-commensurate k ≠ 0."""
        a0, n_cells, n_t = 2.0, 8, 8
        pos0 = np.zeros((n_cells, 3))
        pos0[:, 0] = np.arange(n_cells) * a0
        pos = np.broadcast_to(pos0, (n_t, n_cells, 3)).copy()
        traj = _traj(pos, np.zeros_like(pos), box_edge=n_cells * a0)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        g = 2 * np.pi / a0
        kv = np.array([[g, 0, 0], [2 * np.pi * 3 / (n_cells * a0), 0, 0]],
                      dtype=np.float32)
        sk = calc.calculate_sk(kv)
        assert abs(sk[0] - n_cells) <= 1e-4 * n_cells
        assert sk[1] <= 1e-6 * n_cells
        # ideal gas: fresh uniform positions every frame
        rng = np.random.default_rng(3)
        n_t2, n_a = 512, 400
        L = 20.0
        posg = rng.uniform(0, L, (n_t2, n_a, 3)).astype(np.float32)
        trajg = _traj(posg, np.zeros_like(posg), box_edge=L)
        calcg = SEDCalculator(trajg, nx=1, ny=1, nz=1)
        kvg = instantaneous.nearest_commensurate(
            np.array([[1.0, 0.6, 0], [2.0, 0, 1.2]], np.float32),
            trajg.box_lengths)
        skg = calcg.calculate_sk(kvg)
        # |ρ|²/N per frame has O(1) relative variance; 512 independent
        # frames → ~4.4% standard error
        np.testing.assert_allclose(skg, 1.0, atol=0.2)

    def test_group_selection(self):
        rng = np.random.default_rng(5)
        n_t, n_a = 12, 10
        pos = rng.uniform(0, 8, (n_t, n_a, 3)).astype(np.float32)
        traj = _traj(pos, np.zeros_like(pos), box_edge=8.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = np.array([[0.9, 0.2, -0.5]], np.float32)
        idx = [1, 4, 8]
        sk = calc.calculate_sk(kv, basis_atom_indices=idx)
        ang = np.einsum('tac,kc->tak', pos[:, idx].astype(np.float64),
                        kv.astype(np.float64))
        rho = np.exp(1j * ang).sum(axis=1)
        oracle = (np.abs(rho) ** 2).mean(axis=0) / len(idx)
        np.testing.assert_allclose(sk, oracle, rtol=1e-5)


class TestISF:
    def test_coherent_matches_f64_oracle_and_sk_at_zero_lag(self):
        rng = np.random.default_rng(21)
        n_t, n_a = 32, 9
        pos = rng.uniform(0, 7, (n_t, n_a, 3)).astype(np.float32)
        traj = _traj(pos, np.zeros_like(pos), box_edge=7.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = instantaneous.nearest_commensurate(
            rng.uniform(-2, 2, (4, 3)).astype(np.float32), traj.box_lengths)
        lags, f = calc.calculate_isf(kv, n_lags=16)
        np.testing.assert_allclose(lags, np.arange(16) * traj.dt_ps,
                                   rtol=1e-6)
        # f64 oracle: direct lagged products of rho_k(t)
        ang = np.einsum('tac,kc->tak', pos.astype(np.float64),
                        kv.astype(np.float64))
        rho = np.exp(1j * ang).sum(axis=1)                     # (n_t, K)
        want = np.empty((16, len(kv)))
        for tau in range(16):
            prods = np.conj(rho[:n_t - tau]) * rho[tau:]
            want[tau] = prods.real.mean(axis=0) / n_a
        np.testing.assert_allclose(f, want, rtol=2e-4, atol=1e-5)
        # F(k, 0) = S(k) exactly (same statistic)
        np.testing.assert_allclose(f[0], calc.calculate_sk(kv), rtol=1e-5)

    def test_static_crystal_is_constant_at_bragg(self):
        a0, n_cells, n_t = 2.0, 8, 16
        pos0 = np.zeros((n_cells, 3))
        pos0[:, 0] = np.arange(n_cells) * a0
        pos = np.broadcast_to(pos0, (n_t, n_cells, 3)).copy()
        traj = _traj(pos, np.zeros_like(pos), box_edge=n_cells * a0)
        calc = SEDCalculator(traj, nx=n_cells, ny=1, nz=1)
        kv = np.array([[2 * np.pi / a0, 0, 0]], np.float32)
        _, f = calc.calculate_isf(kv, n_lags=12)
        np.testing.assert_allclose(f[:, 0], n_cells, rtol=1e-4)

    @pytest.mark.slow
    def test_self_brownian_decay_recovers_diffusion(self):
        """F_s(k,τ) = exp(−k²·D·dt·τ) for Brownian walkers — fitting the
        log-slope over the early decay must recover the injected D."""
        rng = np.random.default_rng(13)
        n_t, n_a = 1024, 256
        d_true, dt_ps = 0.4, 0.1
        sigma = np.sqrt(2 * d_true * dt_ps)
        pos = (rng.uniform(0, 40.0, (1, n_a, 3))
               + np.cumsum(rng.normal(0, sigma, (n_t, n_a, 3)), axis=0)
               ).astype(np.float32)
        traj = _traj(pos, np.zeros_like(pos), box_edge=40.0, dt_ps=dt_ps)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = instantaneous.nearest_commensurate(
            np.array([[0.6, 0, 0], [0.9, 0, 0]], np.float32),
            traj.box_lengths)
        lags, f_s = calc.calculate_isf_self(kv, n_lags=40)
        np.testing.assert_allclose(f_s[0], 1.0, rtol=1e-5)   # F_s(k,0) = 1
        k2 = kv[:, 0].astype(np.float64) ** 2
        # log-linear fit over lags where the signal is well above noise
        tail = slice(1, 25)
        tau = lags[tail].astype(np.float64)
        for j in range(len(kv)):
            y = np.log(np.maximum(f_s[tail, j].astype(np.float64), 1e-6))
            slope = np.polyfit(tau, y, 1)[0]
            d_est = -slope / k2[j]
            np.testing.assert_allclose(d_est, d_true, rtol=0.12)


@pytest.mark.slow
class TestSelfDiffusionOracle:
    def test_quasielastic_width_recovers_diffusion_constant(self):
        """Brownian particles with a KNOWN diffusion constant D: the self
        intermediate scattering function is F_s(k, n) = exp(-k²·D·dt·n), so
        the ω = 0 value of the (Σ_ω = 1)-normalized S_s pins the decay rate
        λ = k²·D·dt exactly:  n_t·S_s(k, 0) = (1+e^{-λ})/(1−e^{-λ}).
        Inverting per k must recover D — the liquid-dynamics use case."""
        rng = np.random.default_rng(11)
        n_t, n_a = 2048, 256
        d_true, dt_ps = 0.5, 0.1                   # Å²/ps, ps
        sigma = np.sqrt(2 * d_true * dt_ps)
        steps = rng.normal(0, sigma, (n_t, n_a, 3))
        pos = np.cumsum(steps, axis=0).astype(np.float32)
        traj = _traj(pos, np.zeros_like(pos), box_edge=50.0, dt_ps=dt_ps)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = instantaneous.nearest_commensurate(
            np.array([[0.5, 0, 0], [0.75, 0, 0], [1.0, 0, 0]], np.float32),
            traj.box_lengths)
        freqs, s_s = calc.calculate_dsf_self(kv)
        assert freqs[0] == 0.0
        s0n = n_t * s_s[0].astype(np.float64)      # n_t · S_s(k, ω=0)
        q = (s0n - 1.0) / (s0n + 1.0)              # e^{-λ}
        lam = -np.log(q)
        d_est = lam / (kv[:, 0].astype(np.float64) ** 2 * dt_ps)
        # periodogram noise averages over 256 atoms (~6% at ω=0)
        np.testing.assert_allclose(d_est, d_true, rtol=0.15)
        # and the estimates tighten when pooled over the three k
        assert abs(d_est.mean() - d_true) < 0.08 * d_true


@pytest.mark.slow
class TestSharded:
    """Mesh form vs the single-chip path on the 8-device virtual mesh."""

    def _chain(self):
        traj = make_chain_trajectory(n_cells=12, n_frames=64, dt_ps=0.02,
                                     a=2.5, omega_max_thz=7.0, seed=4)
        calc = SEDCalculator(traj, nx=12, ny=1, nz=1)
        m = np.arange(1, 7)
        kv = np.zeros((len(m), 3), dtype=np.float32)
        kv[:, 0] = 2 * np.pi * m / (12 * 2.5)
        return calc, instantaneous.nearest_commensurate(kv, traj.box_lengths)

    def test_matches_single_chip(self):
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        rf, rs, rcl, rct = calc.calculate_dsf(kv, max_freq=10.0)
        sf, ss, scl, sct = calc.calculate_dsf_sharded(mesh, kv, max_freq=10.0)
        np.testing.assert_allclose(sf, rf, atol=0)
        for got, want in ((ss, rs), (scl, rcl), (sct, rct)):
            assert np.abs(got - want).max() <= 1e-5 * max(want.max(), 1.0)

    def test_streamed_superchunks_match(self):
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        _, rs, rcl, rct = calc.calculate_dsf(kv)
        _, ss, scl, sct = calc.calculate_dsf_sharded(mesh, kv,
                                                     t_superchunk=16)
        for got, want in ((ss, rs), (scl, rcl), (sct, rct)):
            assert np.abs(got - want).max() <= 1e-5 * max(want.max(), 1.0)

    def test_basis_selection_matches(self):
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        idx = list(range(0, 12, 2))
        _, rs, rcl, _ = calc.calculate_dsf(kv, basis_atom_indices=idx)
        _, ss, scl, _ = calc.calculate_dsf_sharded(mesh, kv,
                                                   basis_atom_indices=idx)
        assert np.abs(ss - rs).max() <= 1e-5 * max(rs.max(), 1.0)
        assert np.abs(scl - rcl).max() <= 1e-5 * max(rcl.max(), 1.0)

    def test_k_outer_placement_matches(self):
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2), k_outer=True)
        _, rs, _, _ = calc.calculate_dsf(kv)
        _, ss, _, _ = calc.calculate_dsf_sharded(mesh, kv)
        assert np.abs(ss - rs).max() <= 1e-5 * max(rs.max(), 1.0)

    def test_sk_matches_single_chip(self):
        """S(k) over the mesh (density-only stream, no FFT) must reproduce
        the single-chip value, incl. streamed superchunks and basis
        selection."""
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        want = calc.calculate_sk(kv)
        got = calc.calculate_sk_sharded(mesh, kv)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        got_stream = calc.calculate_sk_sharded(mesh, kv, t_superchunk=16)
        np.testing.assert_allclose(got_stream, want, rtol=1e-5, atol=1e-6)
        idx = list(range(0, 12, 3))
        want_g = calc.calculate_sk(kv, basis_atom_indices=idx)
        got_g = calc.calculate_sk_sharded(mesh, kv, basis_atom_indices=idx)
        np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-6)

    def test_isf_matches_single_chip(self):
        """Coherent and self ISF over the mesh must reproduce the
        single-chip curves, incl. streamed superchunks and basis
        selection."""
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        lags, want = calc.calculate_isf(kv, n_lags=24)
        lags_m, got = calc.calculate_isf_sharded(mesh, kv, n_lags=24)
        np.testing.assert_allclose(lags_m, lags, atol=0)
        np.testing.assert_allclose(got, want, rtol=1e-4,
                                   atol=1e-5 * abs(want).max())
        _, got_s = calc.calculate_isf_sharded(mesh, kv, n_lags=24,
                                              t_superchunk=16)
        np.testing.assert_allclose(got_s, want, rtol=1e-4,
                                   atol=1e-5 * abs(want).max())
        idx = list(range(0, 12, 2))
        _, want_g = calc.calculate_isf_self(kv, n_lags=24,
                                            basis_atom_indices=idx)
        _, got_g = calc.calculate_isf_self_sharded(
            mesh, kv, n_lags=24, basis_atom_indices=idx)
        np.testing.assert_allclose(got_g, want_g, rtol=1e-4, atol=1e-6)
        _, got_c = calc.calculate_isf_self_sharded(
            mesh, kv, n_lags=24, basis_atom_indices=idx, atom_chunk=4)
        np.testing.assert_allclose(got_c, want_g, rtol=1e-4, atol=1e-6)

    def test_self_matches_single_chip(self):
        """S_s over the mesh: atoms shard over the combined (t, a) axes,
        k stripes data-parallel; must reproduce the single-chip planes
        (incl. the Parseval sum) and honor basis selection + chunking."""
        from psa_tpu.parallel import make_mesh
        calc, kv = self._chain()
        mesh = make_mesh(shape=(2, 2, 2))
        rf, rss = calc.calculate_dsf_self(kv, max_freq=10.0)
        sf, sss = calc.calculate_dsf_self_sharded(mesh, kv, max_freq=10.0)
        np.testing.assert_allclose(sf, rf, atol=0)
        assert np.abs(sss - rss).max() <= 1e-5 * max(rss.max(), 1.0)
        # streamed atom chunks (2 chunks of 8 over 12 atoms, padded)
        _, sss_c = calc.calculate_dsf_self_sharded(mesh, kv, max_freq=10.0,
                                                   atom_chunk=8)
        assert np.abs(sss_c - sss).max() <= 1e-6 * max(sss.max(), 1.0)
        # basis sub-group
        idx = [0, 3, 7, 9]
        _, r_g = calc.calculate_dsf_self(kv, basis_atom_indices=idx)
        _, s_g = calc.calculate_dsf_self_sharded(mesh, kv,
                                                 basis_atom_indices=idx)
        assert np.abs(s_g - r_g).max() <= 1e-5 * max(r_g.max(), 1.0)


class TestNearestCommensurate:
    def test_snaps_to_box_lattice(self):
        box = np.array([10.0, 20.0, 0.0])
        kv = np.array([[0.70, 0.30, 0.5]])
        out = instantaneous.nearest_commensurate(kv, box)
        step_x, step_y = 2 * np.pi / 10.0, 2 * np.pi / 20.0
        assert abs(out[0, 0] / step_x - round(out[0, 0] / step_x)) < 1e-6
        assert abs(out[0, 1] / step_y - round(out[0, 1] / step_y)) < 1e-6
        assert out[0, 2] == np.float32(0.5)               # degenerate axis kept

    def test_empty_and_grid_shapes(self):
        box = np.array([8.0, 8.0, 8.0])
        kv = np.zeros((0, 3), dtype=np.float32)
        assert instantaneous.nearest_commensurate(kv, box).shape == (0, 3)

    def test_matrix_form_matches_lengths_for_orthorhombic(self):
        box = np.array([10.0, 14.0, 9.0])
        rng = np.random.default_rng(3)
        kv = rng.uniform(-2, 2, (17, 3))
        np.testing.assert_allclose(
            instantaneous.nearest_commensurate(kv, box),
            instantaneous.nearest_commensurate(kv, np.diag(box)), atol=0)

    def test_triclinic_snap_is_wrap_invariant(self):
        """For a tilted cell the admissible k satisfy H·k = 2π·m (rows of H
        = cell vectors): per-component 2π/L multiples are NOT on that
        lattice, and the snapped k must be."""
        H = np.array([[12.0, 0.0, 0.0],
                      [4.0, 10.0, 0.0],       # xy tilt
                      [0.0, 2.0, 9.0]])       # yz tilt
        rng = np.random.default_rng(5)
        kv = rng.uniform(-1.5, 1.5, (23, 3))
        out = instantaneous.nearest_commensurate(kv, H).astype(np.float64)
        m = out @ H.T / (2 * np.pi)
        np.testing.assert_allclose(m, np.round(m), atol=1e-5)
        assert instantaneous.commensurate_deviation(out, H) < 1e-5
        # the phase is genuinely invariant under wrapping by any cell vector
        r = rng.uniform(0, 10, (6, 3))
        for row in H:
            d = (out @ (r + row).T - out @ r.T) / (2 * np.pi)
            np.testing.assert_allclose(d, np.round(d), atol=1e-5)

    def test_deviation_detects_off_lattice_k(self):
        box = np.array([10.0, 10.0, 10.0])
        on = instantaneous.nearest_commensurate(
            np.array([[0.7, 0.3, 0.0]]), box)
        assert instantaneous.commensurate_deviation(on, box) < 1e-5
        off = on + np.float32(0.25 * 2 * np.pi / 10.0)
        assert instantaneous.commensurate_deviation(off, box) > 0.2
        assert instantaneous.commensurate_deviation(
            np.zeros((0, 3), np.float32), box) == 0.0

    def test_singular_matrix_raises(self):
        H = np.array([[10.0, 0.0, 0.0], [10.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
        with pytest.raises(ValueError, match="singular"):
            instantaneous.nearest_commensurate(np.ones((2, 3)), H)


class TestEdgeCases:
    def test_duplicate_basis_indices_collapse(self):
        """Repeated basis_atom_indices count once (matching the sharded
        path's 0/1 weight vector) — not as doubled amplitude."""
        traj = make_chain_trajectory(n_cells=8, n_frames=16, seed=2)
        calc = SEDCalculator(traj, nx=8, ny=1, nz=1)
        kv = instantaneous.nearest_commensurate(
            np.array([[0.5, 0, 0], [1.0, 0, 0]], np.float32),
            traj.box_lengths)
        f1, s1, cl1, ct1 = calc.calculate_dsf(kv, basis_atom_indices=[0, 0, 2, 5])
        f2, s2, cl2, ct2 = calc.calculate_dsf(kv, basis_atom_indices=[0, 2, 5])
        np.testing.assert_allclose(s1, s2, atol=0)
        np.testing.assert_allclose(cl1, cl2, atol=0)
        np.testing.assert_allclose(ct1, ct2, atol=0)

    def test_empty_k(self):
        traj = make_chain_trajectory(n_cells=4, n_frames=8)
        calc = SEDCalculator(traj, nx=4, ny=1, nz=1)
        freqs, s, c_l, c_t = calc.calculate_dsf(np.zeros((0, 3), np.float32))
        assert s.shape == (len(freqs), 0)
        freqs, s_s = calc.calculate_dsf_self(np.zeros((0, 3), np.float32))
        assert s_s.shape == (len(freqs), 0)

    def test_gamma_point_conventions(self):
        """ρ_0(t) = N: S(0, ω=0) = N; C_L(Γ) = 0 by the unit-k convention."""
        rng = np.random.default_rng(4)
        pos = rng.uniform(0, 5, (8, 6, 3)).astype(np.float32)
        vel = rng.standard_normal((8, 6, 3)).astype(np.float32)
        traj = _traj(pos, vel, box_edge=5.0)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        freqs, s, c_l, c_t = calc.calculate_dsf(
            np.zeros((1, 3), dtype=np.float32))
        assert abs(s[0, 0] - 6.0) <= 1e-5
        assert c_l.max() == 0.0
        assert c_t.max() > 0.0
