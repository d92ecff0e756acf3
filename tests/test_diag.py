"""Diagnostics tests: spectrum, Landau rates, entropy."""

import numpy as np
import jax
import jax.numpy as jnp

from plasma_control_tpu.config import SimConfig
from plasma_control_tpu.diag.landau import (
    compute_bounce_time,
    compute_linear_damping_rate,
    compute_linear_damping_rate_analytic,
    compute_numerical_entropy,
    damping_rate_decay_phase,
    damping_rate_from_field_energy,
    time_to_pe_threshold,
)
from plasma_control_tpu.diag.spectrum import compute_e_k_spectrum, e_k_coefficients, spectrum_wavenumbers
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.models.rollout import rollout, snapshot_from_rollout
from plasma_control_tpu.ops.grid import make_grid

L, M = 50.0, 64


class TestSpectrum:
    def test_wavenumbers_match_fftfreq_mask(self):
        dx = L / M
        ks = spectrum_wavenumbers(M, dx)
        ref = np.fft.fftfreq(M, d=dx) * 2 * np.pi
        np.testing.assert_allclose(ks, ref[ref >= 0])
        ks_odd = spectrum_wavenumbers(63, L / 63)
        assert len(ks_odd) == 32

    def test_coefficients_normalization(self, rng):
        e = rng.standard_normal(M)
        ek = np.asarray(e_k_coefficients(jnp.asarray(e, dtype=jnp.float32)))
        ref = np.fft.fft(e) / M * 2.0
        np.testing.assert_allclose(ek, ref, atol=1e-5)

    def test_single_mode_detection(self, rng):
        """A sinusoidal particle density perturbation shows up in exactly the
        matching E_k row of the spectrum."""
        cfg = SimConfig(n_particles=20000, n_mesh=M, length=L)
        grid = make_grid(M, L)
        # positions with mode-3 density modulation via inverse transform
        u = rng.uniform(0, 1, cfg.n_particles)
        x = u * L  # uniform base
        x = x - 0.4 * np.sin(2 * np.pi * 3 * x / L) * L / (2 * np.pi * 3)  # warp
        snapshot = jnp.asarray(
            np.concatenate([x, np.zeros(cfg.n_particles)])[:, None], dtype=jnp.float32
        )
        spec = np.asarray(compute_e_k_spectrum(1.0, grid, snapshot, M))
        dominant = int(np.argmax(spec[1:, 0])) + 1
        assert dominant == 3

    def test_spectrum_shape(self, rng):
        n = 500
        snap = jnp.asarray(rng.uniform(0, L, (2 * n, 4)), dtype=jnp.float32)
        spec = compute_e_k_spectrum(1.0, make_grid(M, L), snap, M)
        assert spec.shape == (M // 2, 4)


class TestLandau:
    def test_bounce_time(self):
        assert abs(compute_bounce_time(0.25) - 2.0) < 1e-12

    def test_analytic_rate_positive_and_monotone(self):
        g1 = compute_linear_damping_rate_analytic(0.5, 1.0, 1.0)
        g2 = compute_linear_damping_rate_analytic(0.8, 1.0, 1.0)
        assert g1 > 0 and g2 > 0 and g2 > g1  # stronger damping at larger k*lambda_De

    def test_snapshot_rate_consistent_with_pe_rate(self):
        """The snapshot-based regression and the recorded-PE regression must
        give the same growth rate (PE differs by a constant factor only)."""
        cfg = SimConfig(simcase="two-stream", n_particles=2000, n_mesh=M, dt=0.1, t_max=15.0, length=L)
        grid = make_grid(M, L)
        st = init_state(cfg, jax.random.PRNGKey(7))
        out = rollout(st, grid, cfg, record_snapshots=True)
        snap = snapshot_from_rollout(out)
        g_snap = float(compute_linear_damping_rate(cfg.t_max, 1.0, grid, snap, M))
        ts = jnp.linspace(0, cfg.t_max, cfg.n_steps + 1)
        g_pe = float(damping_rate_from_field_energy(ts, out.field_energy))
        assert abs(g_snap - g_pe) < 5e-3

    def test_decay_phase_fit_ignores_saturated_floor(self):
        """VERDICT r3 weak #1 regression: a trace that decays fast then sits
        on its floor must fit the DECAY slope, not the flat tail. The
        full-window fit returns ~0 for such a trace; the decay-phase fit
        recovers the true gamma, and a pure-exponential trace gives the
        same answer on both."""
        ts = jnp.linspace(0.0, 50.0, 500)
        gamma = -0.5
        pure = 100.0 * jnp.exp(2.0 * gamma * ts)
        crushed = jnp.maximum(pure, 1.0)  # floor reached at t ~ 4.6
        g_full = float(damping_rate_from_field_energy(ts, crushed))
        g_decay = damping_rate_decay_phase(ts, crushed)
        assert abs(g_full) < 0.1  # the floor destroys the full-window fit
        assert abs(g_decay - gamma) < 0.05
        assert abs(damping_rate_decay_phase(ts, pure) - gamma) < 0.05

    def test_decay_phase_fit_starts_at_peak(self):
        """Growth-then-decay traces fit only the post-peak decay."""
        ts = jnp.linspace(0.0, 20.0, 200)
        pe = jnp.where(ts < 5.0, jnp.exp(ts), jnp.exp(5.0) * jnp.exp(-2.0 * (ts - 5.0)))
        assert abs(damping_rate_decay_phase(ts, pe) - (-1.0)) < 0.05

    def test_time_to_pe_threshold(self):
        ts = jnp.linspace(0.0, 10.0, 101)
        pe = 100.0 * jnp.exp(-ts)  # hits 10 at t = ln(10) ~ 2.303
        t = time_to_pe_threshold(ts, pe, 10.0)
        assert abs(t - 2.303) < 0.11  # grid resolution 0.1
        assert np.isnan(time_to_pe_threshold(ts, pe, 1e-9))

    def test_time_to_pe_threshold_ignores_pre_growth_crossing(self):
        """A trace growing from quiet noise starts below the threshold; the
        trivial pre-peak crossing must not count (default after_peak)."""
        ts = jnp.linspace(0.0, 20.0, 201)
        pe = jnp.where(ts < 5.0, jnp.exp(ts), jnp.exp(5.0) * jnp.exp(-(ts - 5.0)))
        # crosses 10 upward at t ~ 2.3, downward (post-peak) at t ~ 7.7
        t = time_to_pe_threshold(ts, pe, 10.0)
        assert abs(t - 7.7) < 0.15
        t0 = time_to_pe_threshold(ts, pe, 10.0, after_peak=False,
                                  sustained=False)
        assert t0 < 0.1  # pe[0]=1 <= 10: the trivial crossing

    def test_time_to_pe_threshold_sustained(self):
        """A transient dip that regrows (uncontrolled bump-on-tail's early
        relaxation) must not count as suppression when sustained=True."""
        ts = jnp.linspace(0.0, 30.0, 301)
        # spike at t=0, dips below 10 around t in [2.5, 10], regrows to 30
        pe = 50.0 * jnp.exp(-ts) + 30.0 / (1.0 + jnp.exp(-(ts - 15.0)))
        assert np.isnan(time_to_pe_threshold(ts, pe, 10.0))  # never stays
        t_dip = time_to_pe_threshold(ts, pe, 10.0, sustained=False)
        assert t_dip < 4.0  # the transient dip, if sustained is waived
        # a controlled trace that reaches the floor and stays
        pe_c = 50.0 * jnp.exp(-ts) + 1.0
        assert abs(time_to_pe_threshold(ts, pe_c, 10.0) - 1.7) < 0.2

    def test_entropy_finite(self, rng):
        n = 2000
        snap = jnp.concatenate(
            [
                jnp.asarray(rng.uniform(0, L, n), dtype=jnp.float32),
                jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
            ]
        )
        s = float(
            compute_numerical_entropy(snap, 50, 50, L, L / 50, -10.0, 10.0, 20.0 / 50, 1.0)
        )
        assert np.isfinite(s)
