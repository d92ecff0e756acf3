"""Control-layer tests (SURVEY §4 level 3): actuator, objective, reward,
feedback-law suppression."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plasma_control_tpu.config import ControlConfig, SimConfig
from plasma_control_tpu.control.actuator import make_actuator
from plasma_control_tpu.control.feedback import feedback_coefficients, feedback_rollout
from plasma_control_tpu.control.objective import (
    estimate_electric_energy,
    estimate_f,
    estimate_kl_divergence,
    phase_space_histogram,
)
from plasma_control_tpu.control.reward import Reward
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.models.rollout import rollout
from plasma_control_tpu.ops.grid import make_grid

import oracle


def small_cfg(**kw):
    base = dict(n_particles=2000, n_mesh=64, dt=0.1, t_max=15.0, length=50.0)
    base.update(kw)
    return SimConfig(**base)


class TestActuator:
    def test_basis_against_numpy(self):
        L, M, K = 50.0, 64, 3
        act = make_actuator(L, M, K, endpoint_grid=True)
        xm = np.linspace(0, L, M)
        a = np.array([0.3, -0.2, 0.1])
        b = np.array([0.0, 0.5, -0.4])
        expected = np.zeros(M)
        for n in range(1, K + 1):
            k = 2 * np.pi * n / L
            expected += a[n - 1] * np.cos(k * xm) + b[n - 1] * np.sin(k * xm)
        got = np.asarray(act.compute_e(jnp.asarray(a, dtype=jnp.float32), jnp.asarray(b, dtype=jnp.float32)))
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_packed_layout(self):
        act = make_actuator(50.0, 64, 3)
        a = jnp.asarray([0.3, -0.2, 0.1])
        b = jnp.asarray([0.0, 0.5, -0.4])
        packed = jnp.concatenate([a, b])
        np.testing.assert_allclose(
            np.asarray(act.compute_e_packed(packed)), np.asarray(act.compute_e(a, b)), atol=1e-6
        )

    def test_batched_coefficients(self):
        act = make_actuator(50.0, 64, 3)
        coeffs = jnp.asarray(np.random.default_rng(0).standard_normal((8, 6)), dtype=jnp.float32)
        out = act.compute_e_packed(coeffs)
        assert out.shape == (8, 64)

    def test_input_energy(self):
        act = make_actuator(50.0, 64, 3)
        c = jnp.ones(6)
        # sum(a^2) * L * 0.25  (`reward.py:52-54`)
        assert abs(float(act.input_energy(c)) - 6 * 50.0 * 0.25) < 1e-5


class TestObjective:
    def test_histogram_matches_numpy(self, rng):
        x = rng.uniform(0, 50.0, 5000)
        v = rng.standard_normal(5000) * 5
        h = np.asarray(phase_space_histogram(jnp.asarray(x, dtype=jnp.float32), jnp.asarray(v, dtype=jnp.float32), 50, 50.0, -25.0, 25.0))
        h_ref, _, _ = np.histogram2d(x, v, bins=[50, 50], range=[[0, 50.0], [-25.0, 25.0]])
        np.testing.assert_allclose(h, h_ref, atol=1e-3)

    def test_estimate_f_normalization(self, rng):
        n = 5000
        state = jnp.concatenate(
            [
                jnp.asarray(rng.uniform(0, 50.0, n), dtype=jnp.float32),
                jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
            ]
        )
        f = estimate_f(state, 100, 50.0, -25.0, 25.0, 1.0)
        dx, dv = 50.0 / 100, 50.0 / 100
        # reference normalization (`objective.py:13`): integral of f dx dv = n0
        total = float(jnp.sum(f)) * dx * dv
        assert abs(total - 1.0) < 0.01

    def test_kl_zero_for_identical(self, rng):
        f = jnp.asarray(np.abs(rng.standard_normal((20, 20))), dtype=jnp.float32)
        kl = float(estimate_kl_divergence(f, f))
        assert abs(kl) < 1e-4

    def test_kl_positive_for_different(self, rng):
        f = jnp.asarray(np.abs(rng.standard_normal((20, 20))) + 0.1, dtype=jnp.float32)
        g = jnp.roll(f, 3, axis=0) * 2.0
        assert float(estimate_kl_divergence(f, g)) != 0.0

    def test_electric_energy_no_rescale(self, rng):
        """objective.estimate_electric_energy omits the N/L rescale
        (`/root/reference/src/control/objective.py:34` commented out)."""
        n = 2000
        x64 = rng.uniform(0, 50.0, n)
        state = jnp.concatenate(
            [jnp.asarray(x64, dtype=jnp.float32), jnp.zeros(n, dtype=jnp.float32)]
        )
        pe = float(estimate_electric_energy(state, None, 64, 50.0, 1.0))
        e_ref = oracle.solve_e_mesh(oracle.deposit_cic(x64, 1.0, 50.0, 64), 50.0, 1.0)
        pe_ref = 0.5 * np.sum(e_ref**2) * (50.0 / 64)
        assert abs(pe - pe_ref) < max(2e-3, 0.01 * abs(pe_ref))


class TestReward:
    def test_reward_structure(self, rng):
        n = 2000
        state = jnp.concatenate(
            [
                jnp.asarray(rng.uniform(0, 50.0, n), dtype=jnp.float32),
                jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
            ]
        )
        r = Reward(state, n_mesh=100, length=50.0, n_actions=6)
        # r_ie_n = IE(ones(6)) = 6 * 50 * 0.25 = 75
        assert abs(r.r_ie_n - 75.0) < 1e-4
        val = float(r.compute_reward(state, jnp.zeros(6)))
        # zero action -> r_ie term = beta; r_pe in [0, 1]
        assert 1.0 <= val <= 2.0
        kl, pe, ie = r.compute_cost(state, jnp.zeros(6))
        assert float(ie) == 0.0 and float(kl) < 1e-3

    def test_shaped_reward(self, rng):
        """compute_reward_shaped: r_pe = alpha/2 at the initial state, strictly
        decreasing in PE, positive; reward_fn selects between the variants."""
        n = 2000
        x = jnp.asarray(rng.uniform(0, 50.0, n), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal(n), dtype=jnp.float32)
        state = jnp.concatenate([x, v])
        r = Reward(state, n_mesh=100, length=50.0, n_actions=6)
        a0 = jnp.zeros(6)

        # at the init state PE = PE0, so the field term is exactly alpha/2
        val0 = float(r.compute_reward_shaped(state, a0))
        assert abs(val0 - (0.5 * r.alpha + r.beta)) < 1e-5

        # a quieter state (uniform positions => lower PE) scores higher
        quiet = jnp.concatenate([jnp.linspace(0.0, 50.0, n, endpoint=False), v])
        louder = jnp.concatenate([0.5 * x, v])  # all particles in [0, L/2]
        assert float(r.compute_reward_shaped(quiet, a0)) > val0
        assert float(r.compute_reward_shaped(louder, a0)) < val0
        assert float(r.compute_reward_shaped(louder, a0)) > 0.0

        assert r.reward_fn("reference") == r.compute_reward
        assert r.reward_fn("shaped") == r.compute_reward_shaped
        with pytest.raises(ValueError):
            r.reward_fn("nope")

    def test_tanh_variants_finite(self, rng):
        n = 1000
        state = jnp.concatenate(
            [
                jnp.asarray(rng.uniform(0, 50.0, n), dtype=jnp.float32),
                jnp.asarray(rng.standard_normal(n), dtype=jnp.float32),
            ]
        )
        r = Reward(state, n_mesh=50, length=50.0, n_actions=6)
        for f in (r.compute_reward_kl_divergence, r.compute_reward_electric_energy):
            assert np.isfinite(float(f(state)))
        assert np.isfinite(float(r.compute_reward_input_energy(jnp.ones(6))))


class TestFeedback:
    def test_coefficients_match_spectrum(self, rng):
        """a = -Re(Ek), b = +Im(Ek) for modes 1..K (`run_feedback.py:133-135`)."""
        m = 64
        e_mesh = jnp.asarray(rng.standard_normal(m), dtype=jnp.float32)
        a, b = feedback_coefficients(e_mesh, 3)
        ek = np.fft.fft(np.asarray(e_mesh)) / m * 2
        np.testing.assert_allclose(np.asarray(a), -ek[1:4].real, atol=1e-5)
        np.testing.assert_allclose(np.asarray(b), ek[1:4].imag, atol=1e-5)

    def test_feedback_suppresses_two_stream(self):
        """Field energy under feedback must end far below uncontrolled
        (the reference's headline qualitative result)."""
        cfg = small_cfg(simcase="two-stream", t_max=25.0)
        ctrl = ControlConfig(max_mode=3)
        grid = make_grid(cfg.n_mesh, cfg.length)
        act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
        st = init_state(cfg, jax.random.PRNGKey(42))

        un = rollout(st, grid, cfg)
        fb = feedback_rollout(st, grid, cfg, ctrl, act)

        pe_un = float(jnp.mean(un.field_energy[-50:]))
        pe_fb = float(jnp.mean(fb.field_energy[-50:]))
        assert pe_fb < 0.4 * pe_un, f"feedback {pe_fb} vs uncontrolled {pe_un}"
        assert np.isfinite(np.asarray(fb.coeff_cos)).all()

    def test_feedback_output_shapes(self):
        cfg = small_cfg(t_max=2.0)
        ctrl = ControlConfig(max_mode=2)
        grid = make_grid(cfg.n_mesh, cfg.length)
        act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
        st = init_state(cfg, jax.random.PRNGKey(0))
        fb = feedback_rollout(st, grid, cfg, ctrl, act, record_snapshots=True)
        t = cfg.n_steps
        assert fb.coeff_cos.shape == (t, 2)
        assert fb.field_energy.shape == (t,)
        assert fb.xs.shape == (t + 1, cfg.n_particles)


class TestEFieldStateful:
    def test_reference_api_surface(self):
        """EField mirrors the reference class (`actuator.py:4-63`)."""
        from plasma_control_tpu.control.actuator import EField

        ef = EField(50.0, 64, 3)
        e0 = np.asarray(ef.compute_E())
        np.testing.assert_allclose(e0, 0.0, atol=1e-7)
        ef.update_E(coeff_cos=np.array([1.0, 0, 0]), coeff_sin=np.array([0.0, 0, 0]))
        e1 = np.asarray(ef.compute_E())
        xm = np.linspace(0, 50.0, 64)
        np.testing.assert_allclose(e1, np.cos(2 * np.pi * xm / 50.0), atol=1e-5)
        ef.update_params(max_mode=2)
        assert ef.actuator.basis_cos.shape == (64, 2)
        ef.reinit()
        np.testing.assert_allclose(np.asarray(ef.compute_E()), 0.0, atol=1e-7)
