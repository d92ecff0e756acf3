"""Pallas kernel tests (interpret mode on CPU; compiled path exercised by
bench on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from plasma_control_tpu.ops.deposit import deposit, gather
from plasma_control_tpu.ops.grid import make_grid
from plasma_control_tpu.ops.pallas.cic_pallas import deposit_cic_pallas, gather_cic_pallas

L, M = 50.0, 64


class TestPallasCIC:
    def test_deposit_matches_dense(self, rng):
        x = jnp.asarray(rng.uniform(0, L, 700), dtype=jnp.float32)  # non-divisible N
        grid = make_grid(M, L)
        ref = deposit(x, grid, normalize=False)
        got = deposit_cic_pallas(x, M, L, block_n=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)

    def test_deposit_batched(self, rng):
        x = jnp.asarray(rng.uniform(0, L, (4, 512)), dtype=jnp.float32)
        grid = make_grid(M, L)
        ref = jax.vmap(lambda xx: deposit(xx, grid, normalize=False))(x)
        got = deposit_cic_pallas(x, M, L, block_n=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-4)

    def test_gather_matches_dense(self, rng):
        x = jnp.asarray(rng.uniform(0, L, 700), dtype=jnp.float32)
        e = jnp.asarray(rng.standard_normal(M), dtype=jnp.float32)
        grid = make_grid(M, L)
        ref = gather(e, x, grid)
        got = gather_cic_pallas(e, x, M, L, block_n=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_gather_batched(self, rng):
        x = jnp.asarray(rng.uniform(0, L, (4, 512)), dtype=jnp.float32)
        e = jnp.asarray(rng.standard_normal((4, M)), dtype=jnp.float32)
        grid = make_grid(M, L)
        ref = jax.vmap(lambda ee, xx: gather(ee, xx, grid))(e, x)
        got = gather_cic_pallas(e, x, M, L, block_n=256, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    def test_charge_conservation(self, rng):
        x = jnp.asarray(rng.uniform(0, L, 1000), dtype=jnp.float32)
        n = deposit_cic_pallas(x, M, L, interpret=True)
        assert abs(float(jnp.sum(n)) - 1000.0) < 1e-2
