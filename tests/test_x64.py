"""Float64 equivalence: with x64 enabled, the JAX pipeline matches the
float64 NumPy oracle to near machine precision — isolating design differences
from float32 rounding."""

import numpy as np
import jax
import jax.numpy as jnp

from plasma_control_tpu.config import SimConfig
from plasma_control_tpu.models.pic import PlasmaState, step
from plasma_control_tpu.ops.deposit import deposit
from plasma_control_tpu.ops.fields import solve_e_mesh
from plasma_control_tpu.ops.grid import make_grid

import oracle

L, M, N = 50.0, 64, 1500


class TestX64Equivalence:
    def test_deposit_and_solve_match_oracle_tightly(self, rng):
        x64 = rng.uniform(0, L, N)
        with jax.enable_x64():
            grid = make_grid(M, L, dtype=jnp.float64)
            n = np.asarray(deposit(jnp.asarray(x64), grid, n0=1.0))
            e = np.asarray(solve_e_mesh(jnp.asarray(n), grid, 1.0))
        n_ref = oracle.deposit_cic(x64, 1.0, L, M)
        e_ref = oracle.solve_e_mesh(n_ref, L, 1.0)
        np.testing.assert_allclose(n, n_ref, rtol=1e-12, atol=1e-12)
        np.testing.assert_allclose(e, e_ref, rtol=1e-9, atol=1e-11)

    def test_full_step_matches_oracle_tightly(self, rng):
        x64 = rng.uniform(0, L, N)
        v64 = rng.standard_normal(N)
        cfg = SimConfig(n_particles=N, n_mesh=M, dt=0.1, length=L)
        with jax.enable_x64():
            grid = make_grid(M, L, dtype=jnp.float64)
            st = PlasmaState(jnp.asarray(x64), jnp.asarray(v64))
            out = step(st, grid, cfg)
            x_jax = np.asarray(out.x)
            v_jax = np.asarray(out.v)
        xr, vr = oracle.yoshida4_step(x64.copy(), v64.copy(), L, M, 1.0, cfg.clamped_dt())
        np.testing.assert_allclose(v_jax, vr, rtol=1e-9, atol=1e-10)
        dx = np.abs(x_jax - xr)
        assert np.maximum(dx, L - dx).min() >= 0  # well-defined
        np.testing.assert_allclose(np.minimum(dx, L - dx), 0.0, atol=1e-9)
