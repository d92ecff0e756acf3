"""Golden-trace tests: the compiled JAX closed loop vs an independent
float64 native-C++ implementation of the reference semantics.

This is the BASELINE.md acceptance-style check: the controlled field-energy
trajectory of our TPU path must track the reference implementation within
tight tolerance over the control horizon.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from plasma_control_tpu.config import ControlConfig, SimConfig
from plasma_control_tpu.control.actuator import make_actuator
from plasma_control_tpu.control.feedback import feedback_rollout
from plasma_control_tpu.models.pic import PlasmaState, init_state
from plasma_control_tpu.models.rollout import rollout
from plasma_control_tpu.ops.grid import make_grid
from plasma_control_tpu.utils.native import load_library, native_rollout, native_solve_e, native_step

import oracle

needs_native = pytest.mark.skipif(load_library() is None, reason="native library unavailable")

L, M, N, DT = 50.0, 64, 2000, 0.1
K = 3  # control modes


def _native_feedback_trace(x, v, t_steps):
    """Reference-semantics closed-loop feedback in float64 via the C++ lib."""
    xm = np.linspace(0.0, L, M)  # endpoint grid, actuator parity
    k = 2 * np.pi / L * np.arange(1, K + 1)
    basis_cos = np.cos(np.outer(xm, k))
    basis_sin = np.sin(np.outer(xm, k))

    pes = []
    for _ in range(t_steps):
        dens = oracle.deposit_cic(x, 1.0, L, M)
        e_mesh = native_solve_e(dens - 1.0, L)
        ek = np.fft.fft(e_mesh) / M * 2.0
        a = -np.real(ek[1 : K + 1])
        b = np.imag(ek[1 : K + 1])
        e_ext = basis_cos @ a + basis_sin @ b
        x, v, pe = native_step(x, v, M, L, DT, e_external=e_ext)
        pes.append(pe)
    return np.asarray(pes)


@needs_native
class TestGoldenTraces:
    def test_uncontrolled_pe_trace_matches(self):
        cfg = SimConfig(n_particles=N, n_mesh=M, dt=DT, t_max=8.0, length=L)
        grid = make_grid(M, L)
        st = init_state(cfg, jax.random.PRNGKey(42))
        out = rollout(st, grid, cfg)

        x = np.asarray(st.x, dtype=np.float64)
        v = np.asarray(st.v, dtype=np.float64)
        _, _, pe_ref = native_rollout(x, v, M, L, DT, cfg.n_steps)

        pe_jax = np.asarray(out.field_energy[1:])
        rel = np.abs(pe_jax - pe_ref) / np.abs(pe_ref)
        assert rel.max() < 0.01, f"max relative PE error {rel.max():.4f}"

    def test_feedback_pe_trace_matches(self):
        """Controlled trajectory: float32 TPU path vs float64 reference path
        must agree on the field-energy trace within 1% (BASELINE tolerance)."""
        cfg = SimConfig(n_particles=N, n_mesh=M, dt=DT, t_max=8.0, length=L)
        ctrl = ControlConfig(max_mode=K)
        grid = make_grid(M, L)
        act = make_actuator(L, M, K)
        st = init_state(cfg, jax.random.PRNGKey(42))

        fb = feedback_rollout(st, grid, cfg, ctrl, act)
        pe_jax = np.asarray(fb.field_energy)

        pe_ref = _native_feedback_trace(
            np.asarray(st.x, dtype=np.float64), np.asarray(st.v, dtype=np.float64), cfg.n_steps
        )
        rel = np.abs(pe_jax - pe_ref) / np.abs(pe_ref)
        assert rel.max() < 0.01, f"max relative PE error {rel.max():.4f}"


@needs_native
class TestGoldenBumpOnTail:
    def test_bump_on_tail_feedback_trace(self):
        """Same golden check on the bump-on-tail case."""
        cfg = SimConfig(
            simcase="bump-on-tail", n_particles=N, n_mesh=M, dt=DT, t_max=8.0, length=L
        )
        ctrl = ControlConfig(max_mode=K)
        grid = make_grid(M, L)
        act = make_actuator(L, M, K)
        st = init_state(cfg, jax.random.PRNGKey(7))

        fb = feedback_rollout(st, grid, cfg, ctrl, act)
        pe_ref = _native_feedback_trace(
            np.asarray(st.x, dtype=np.float64), np.asarray(st.v, dtype=np.float64), cfg.n_steps
        )
        rel = np.abs(np.asarray(fb.field_energy) - pe_ref) / np.abs(pe_ref)
        assert rel.max() < 0.01, f"max relative PE error {rel.max():.4f}"
