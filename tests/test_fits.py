"""ISF relaxation-fit utilities: KWW recovery + τ_α + Brownian physics.

The Gauss–Newton KWW fit must recover injected (A, τ₀, β) from exact and
noisy stretched exponentials; τ_α must hit the analytic 1/e crossing; and
the end-to-end route calculate_isf_self → kww_fit must give β ≈ 1 and a
fourth independent diffusion estimate D = 1/(τ_k·k²) on Brownian walkers.
"""
import numpy as np
import pytest

from psa_tpu.utils import isf_relaxation_time, kww_fit


def _kww(t, a, tau, beta):
    return a * np.exp(-(t / tau) ** beta)


class TestKWWFit:
    def test_recovers_exact_parameters(self):
        t = np.linspace(0.0, 40.0, 400)
        params = [(1.0, 5.0, 1.0), (0.9, 2.0, 0.6), (0.7, 10.0, 1.8),
                  (1.0, 0.5, 0.45)]
        f = np.stack([_kww(t, *p) for p in params], axis=1)
        amp, tau, beta, rms = kww_fit(t, f, normalize=False)
        for k, (a0, t0, b0) in enumerate(params):
            np.testing.assert_allclose(amp[k], a0, rtol=1e-3)
            np.testing.assert_allclose(tau[k], t0, rtol=1e-2)
            np.testing.assert_allclose(beta[k], b0, rtol=1e-2)
            assert rms[k] < 1e-5

    def test_noisy_recovery(self):
        rng = np.random.default_rng(0)
        t = np.linspace(0.0, 30.0, 300)
        f = _kww(t, 1.0, 4.0, 0.8)[:, None] + rng.normal(0, 1e-3, (300, 1))
        amp, tau, beta, rms = kww_fit(t, f, normalize=False)
        np.testing.assert_allclose(tau[0], 4.0, rtol=0.05)
        np.testing.assert_allclose(beta[0], 0.8, rtol=0.05)
        assert rms[0] < 5e-3

    def test_normalize_and_window(self):
        """A two-step curve: fitting only past the microscopic step makes
        the amplitude the plateau height (non-ergodicity factor)."""
        t = np.linspace(0.0, 200.0, 2000)
        fast = 0.4 * np.exp(-t / 0.3)          # microscopic β-step
        slow = _kww(t, 0.6, 50.0, 0.7)          # α-relaxation from plateau
        f = (fast + slow)[:, None] * 2.0        # un-normalized (S(k)=2)
        amp, tau, beta, _ = kww_fit(t, f, fit_window=(3.0, 200.0))
        np.testing.assert_allclose(amp[0], 0.6, rtol=0.05)
        np.testing.assert_allclose(tau[0], 50.0, rtol=0.10)
        np.testing.assert_allclose(beta[0], 0.7, rtol=0.05)

    def test_degenerate_inputs(self):
        t = np.linspace(0.0, 1.0, 2)           # < 3 usable points
        amp, tau, beta, rms = kww_fit(t, np.ones((2, 3)))
        assert np.isnan(amp).all() and np.isnan(tau).all()
        # non-finite column → NaN, finite columns still fit
        t = np.linspace(0.0, 10.0, 50)
        f = np.stack([_kww(t, 1.0, 2.0, 1.0),
                      np.full(50, np.nan)], axis=1)
        amp, tau, beta, _ = kww_fit(t, f, normalize=False)
        np.testing.assert_allclose(tau[0], 2.0, rtol=1e-2)
        assert np.isnan(tau[1])


class TestRelaxationTime:
    def test_exponential_crossing_is_tau(self):
        t = np.linspace(0.0, 20.0, 500)
        f = np.stack([np.exp(-t / 3.0), np.exp(-t / 7.0)], axis=1)
        tau = isf_relaxation_time(t, f)
        np.testing.assert_allclose(tau, [3.0, 7.0], rtol=1e-3)

    def test_unnormalized_input_and_no_crossing(self):
        t = np.linspace(0.0, 5.0, 100)
        f = np.stack([4.0 * np.exp(-t / 1.5),       # S(k)=4, normalize
                      np.exp(-t / 1e4)], axis=1)    # never decays
        tau = isf_relaxation_time(t, f)
        np.testing.assert_allclose(tau[0], 1.5, rtol=1e-3)
        assert np.isnan(tau[1])


@pytest.mark.slow
class TestBrownianEndToEnd:
    def test_isf_self_kww_gives_beta_one_and_d(self):
        """F_s(k,τ) = exp(−k²Dτ) for Fickian diffusion: the fit must find
        β ≈ 1 and D = 1/(τ_k·k²) ≈ D_true — the fourth independent D
        estimator (after S_s inversion, F_s log-slope, MSD slope)."""
        from psa_tpu import SEDCalculator
        from psa_tpu.core.trajectory import Trajectory, make_box_arrays

        rng = np.random.default_rng(3)
        n_t, n_a = 4096, 256
        d_true, dt_ps = 0.25, 0.1
        sigma = np.sqrt(2 * d_true * dt_ps)
        pos = np.cumsum(rng.normal(0, sigma, (n_t, n_a, 3)), axis=0)
        box = np.diag([50.0] * 3).astype(np.float32)
        lengths, tilts = make_box_arrays(box)
        traj = Trajectory(pos.astype(np.float32),
                          np.zeros_like(pos, dtype=np.float32),
                          np.ones(n_a, np.int32),
                          np.arange(n_t, dtype=np.float32), box_matrix=box,
                          box_lengths=lengths, box_tilts=tilts, dt_ps=dt_ps)
        calc = SEDCalculator(traj, nx=1, ny=1, nz=1)
        kv = np.array([[2 * np.pi / 50.0 * 8, 0, 0],
                       [0, 2 * np.pi / 50.0 * 12, 0]], dtype=np.float32)
        lags, fs = calc.calculate_isf_self(kv, n_lags=256)
        amp, tau, beta, _ = kww_fit(lags, fs)
        k2 = (np.linalg.norm(kv, axis=1).astype(np.float64)) ** 2
        d_est = 1.0 / (tau * k2)
        np.testing.assert_allclose(beta, 1.0, atol=0.08)
        np.testing.assert_allclose(d_est, d_true, rtol=0.10)
        np.testing.assert_allclose(amp, 1.0, atol=0.05)
