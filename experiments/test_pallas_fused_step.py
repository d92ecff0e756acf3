"""Correctness tests for the DEMOTED grid-planner Pallas kernels
(experiments/pallas_fused_step.py — VERDICT r3 #6 moved them out of
``ops/pallas/`` because they measure 2-3x slower than the XLA path).

Moved with the code from tests/test_pallas.py::TestFusedStep and
tests/test_mpc.py (fused/packed KDK-vs-XLA equivalence). NOT collected by
the default CI run (testpaths = tests/); run explicitly when touching the
experimental kernels:

    python -m pytest experiments/test_pallas_fused_step.py -q
"""

import os
import sys

import jax

if "pytest" in sys.modules or __name__ == "__main__":
    # standalone: mirror tests/conftest.py's forced-CPU setup (sitecustomize
    # pins JAX_PLATFORMS before env vars can act — DEVNOTES)
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (e.g. run from the tests conftest)

import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pallas_fused_step import (  # noqa: E402
    fused_kdk_horizon,
    fused_leapfrog_step,
    fused_packed_horizon,
    fused_step_supported,
    packed_horizon_supported,
)
from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig  # noqa: E402
from plasma_control_tpu.control.actuator import make_actuator  # noqa: E402
from plasma_control_tpu.control.mpc import (  # noqa: E402
    _add_terminal,
    _finite_or_huge,
    candidate_costs,
)
from plasma_control_tpu.models.pic import PlasmaState, init_state  # noqa: E402
from plasma_control_tpu.ops.fields import electric_energy  # noqa: E402
from plasma_control_tpu.ops.grid import make_grid  # noqa: E402

L, M = 50.0, 64
CTRL = ControlConfig(max_mode=2)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def tiny_cfg(n_particles=512, n_mesh=M):
    return SimConfig(simcase="two-stream", n_particles=n_particles,
                     n_mesh=n_mesh, dt=0.1, t_max=5.0, length=L)


def grid_pallas_candidate_costs(state, coeff_seqs, grid, cfg, mpc, actuator,
                                packed=False):
    """The grid-model Pallas dispatch exactly as it shipped in
    control/mpc.py::candidate_costs before the round-4 demotion."""
    horizon_kernel = fused_packed_horizon if packed else fused_kdk_horizon
    u_mesh = actuator.compute_e_packed(coeff_seqs)  # (K, H, M)
    pe = horizon_kernel(
        state.x, state.v, u_mesh, grid.e_op.T,
        n_mesh=grid.n_mesh, length=cfg.length, dt=cfg.clamped_dt(), n0=cfg.n0,
        interpret=jax.default_backend() != "tpu",
    )  # (K, H) exact post-step PE
    pe = pe * (cfg.n_particles / cfg.length)  # electric_energy rescale
    ie = actuator.input_energy(coeff_seqs)  # (K, H)
    total = _add_terminal(
        jnp.sum(mpc.w_field * pe + mpc.w_input * ie, axis=-1), pe, mpc
    )
    return _finite_or_huge(total)


class TestFusedStep:
    """The fused leapfrog planning-step kernel vs the XLA op-by-op path."""

    def _xla_leapfrog(self, x, v, e_ext, grid, cfg, exact):
        from plasma_control_tpu.control.mpc import _step_and_pe

        st, pe = _step_and_pe(
            PlasmaState(x, v), e_ext, grid, cfg, exact, "leapfrog", "xla"
        )
        return st.x, st.v, pe

    def _setup(self, rng, n=700, batch=None):
        shape = (n,) if batch is None else (batch, n)
        x = jnp.asarray(rng.uniform(0, L, shape), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal(shape), dtype=jnp.float32)
        grid = make_grid(M, L)
        cfg = SimConfig(n_particles=n, n_mesh=M, dt=0.1, t_max=5.0, length=L)
        return x, v, grid, cfg

    def test_matches_xla_leapfrog(self, rng):
        x, v, grid, cfg = self._setup(rng)
        e_ext = jnp.asarray(0.05 * rng.standard_normal(M), dtype=jnp.float32)
        for exact in (True, False):
            rx, rv, rpe = self._xla_leapfrog(x, v, e_ext, grid, cfg, exact)
            gx, gv, ge = fused_leapfrog_step(
                x, v, e_ext, grid.e_op.T,
                n_mesh=M, length=L, dt=cfg.clamped_dt(), exact=exact, interpret=True,
            )
            gpe = electric_energy(ge, grid, cfg.n_particles)
            np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-5, atol=1e-4)
            np.testing.assert_allclose(float(gpe), float(rpe), rtol=1e-4)

    def test_batched_and_vmap(self, rng):
        x, v, grid, cfg = self._setup(rng, n=512, batch=5)  # non-divisible batch
        e_ext = jnp.asarray(0.05 * rng.standard_normal((5, M)), dtype=jnp.float32)
        rx, rv, rpe = jax.vmap(
            lambda xx, vv, ee: self._xla_leapfrog(xx, vv, ee, grid, cfg, True)
        )(x, v, e_ext)
        kw = dict(n_mesh=M, length=L, dt=cfg.clamped_dt(), exact=True, interpret=True)
        gx, gv, ge = fused_leapfrog_step(x, v, e_ext, grid.e_op.T, **kw)
        np.testing.assert_allclose(np.asarray(gx), np.asarray(rx), rtol=1e-5, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gv), np.asarray(rv), rtol=1e-5, atol=1e-4)
        # vmap reroutes to the batched kernel via the custom_vmap rule
        vx, vv_, vge = jax.vmap(
            lambda xx, vv, ee: fused_leapfrog_step(xx, vv, ee, grid.e_op.T, **kw)
        )(x, v, e_ext)
        np.testing.assert_allclose(np.asarray(vx), np.asarray(gx), rtol=1e-6, atol=1e-6)
        np.testing.assert_allclose(np.asarray(vge), np.asarray(ge), rtol=1e-6, atol=1e-6)

    def test_vmem_support_gate(self):
        assert fused_step_supported(1024, 64)
        assert fused_step_supported(2048, 128)
        assert not fused_step_supported(1_000_000, 256)
        assert not fused_step_supported(1024, 64, kind="tsc")


class TestHorizonKernels:
    """Whole-horizon fused/packed KDK kernels vs the XLA KDK candidate costs
    (moved from tests/test_mpc.py at the demotion)."""

    def test_fused_kdk_matches_xla_kdk(self, rng):
        cfg = tiny_cfg(n_particles=700)  # non-aligned N exercises padding
        grid = make_grid(cfg.n_mesh, cfg.length)
        act = make_actuator(cfg.length, cfg.n_mesh, CTRL.max_mode)
        st = init_state(cfg, jax.random.PRNGKey(0))
        cand = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (13, 5, 4))  # odd K
        mpc = MPCConfig(horizon=5, plan_model="grid", plan_integrator="kdk",
                        plan_kernel="xla")
        assert fused_step_supported(cfg.n_particles, cfg.n_mesh)
        c_xla = np.asarray(candidate_costs(st, cand, grid, cfg, mpc, act))
        c_fused = np.asarray(
            grid_pallas_candidate_costs(st, cand, grid, cfg, mpc, act))
        np.testing.assert_allclose(c_fused, c_xla, rtol=2e-4)

    @pytest.mark.parametrize("n_mesh", [32, 48, 64])
    def test_packed_kdk_matches_xla_kdk(self, rng, n_mesh):
        """Pack factors p = 128//M (p=4, p=2 with partial lanes W=96, p=2)."""
        cfg = tiny_cfg(n_particles=700, n_mesh=n_mesh)  # non-aligned N: row mask
        grid = make_grid(cfg.n_mesh, cfg.length)
        act = make_actuator(cfg.length, cfg.n_mesh, CTRL.max_mode)
        st = init_state(cfg, jax.random.PRNGKey(0))
        cand = 0.3 * jax.random.normal(jax.random.PRNGKey(1), (13, 5, 4))  # odd K
        mpc = MPCConfig(horizon=5, plan_model="grid", plan_integrator="kdk",
                        plan_kernel="xla")
        assert packed_horizon_supported(cfg.n_particles, cfg.n_mesh)
        c_xla = np.asarray(candidate_costs(st, cand, grid, cfg, mpc, act))
        c_packed = np.asarray(
            grid_pallas_candidate_costs(st, cand, grid, cfg, mpc, act, packed=True))
        np.testing.assert_allclose(c_packed, c_xla, rtol=2e-4)


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-q"]))
