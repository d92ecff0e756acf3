"""Sharded PIC stepping and MPC planning over a device mesh.

New TPU-native capability (the reference is single-device, SURVEY §2.6):

* **particle sharding** — the particle arrays (x, v) are sharded along a
  ``"particle"`` mesh axis. Deposition computes a *local partial density* from
  the local particle block and ``psum``s the small (M,) vector over ICI — the
  TPU analogue of PIC domain decomposition. The field solve is replicated
  (tiny circulant matmul); the gather needs only local particles + the
  replicated mesh field. One psum of M floats per field evaluation (3 per
  Yoshida step) is the entire communication volume.
* **rollout sharding** — MPC candidate control sequences are sharded along a
  ``"rollout"`` axis; each device rolls out its candidate block independently
  (zero communication) and only the (K,) cost vector is gathered for the
  MPPI/CEM update.

Both run unchanged on a virtual CPU mesh (tests) and a real TPU slice.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ControlConfig, MPCConfig, SimConfig
from ..control.actuator import FourierActuator
from ..control.mpc import candidate_costs
from ..models.pic import PlasmaState
from ..ops.deposit import deposit, gather
from ..ops.fields import solve_e_mesh
from ..ops.grid import Grid
from ..ops.integrate import INTEGRATORS

__all__ = ["make_particle_sharded_step", "make_sharded_candidate_costs", "sharded_plan"]


def make_particle_sharded_step(
    mesh: Mesh,
    grid: Grid,
    cfg: SimConfig,
    axis: str = "particle",
):
    """Build a jit-compiled step function with (x, v) sharded over ``axis``.

    Returns ``step_fn(x, v, e_external) -> (x, v)`` where the particle arrays
    are sharded over the mesh axis and ``e_external`` (an (M,) mesh field) is
    replicated. Semantics identical to :func:`plasma_control_tpu.models.pic.step`.
    """
    norm = cfg.n0 * cfg.length / cfg.n_particles / grid.dx

    def accel_factory(e_ext):
        def accel(x_local):
            n_raw = deposit(x_local, grid, kind=cfg.interpol, method=cfg.deposit_method, normalize=False)
            n = jax.lax.psum(n_raw, axis) * norm  # ICI collective: (M,) floats
            e_mesh = solve_e_mesh(n, grid, cfg.n0) + e_ext
            return -gather(e_mesh, x_local, grid, kind=cfg.interpol, method=cfg.deposit_method)

        return accel

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P()),
        out_specs=(P(axis), P(axis)),
    )
    def _sharded(x, v, e_ext):
        integ = INTEGRATORS[cfg.integrator]
        x2, v2 = integ(x, v, accel_factory(e_ext), cfg.clamped_dt())
        return jnp.mod(x2, cfg.length), v2

    return jax.jit(_sharded)


def make_sharded_candidate_costs(
    mesh: Mesh,
    grid: Grid,
    cfg: SimConfig,
    mpc: MPCConfig,
    actuator: FourierActuator,
    axis: str = "rollout",
):
    """Candidate-cost evaluation with the candidate axis sharded over ``axis``.

    Each device scores its local candidate block (independent H-step PIC
    rollouts); only the (K,) cost vector crosses devices (all-gather at the
    boundary). Returns ``costs_fn(state, coeff_seqs) -> (K,) costs``.
    """

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def _local(x, v, cand):
        return candidate_costs(PlasmaState(x, v), cand, grid, cfg, mpc, actuator)

    return jax.jit(lambda state, cand: _local(state.x, state.v, cand))


def sharded_plan(
    state: PlasmaState,
    mean: jax.Array,
    sigma: jax.Array,
    key: jax.Array,
    mesh: Mesh,
    grid: Grid,
    cfg: SimConfig,
    ctrl: ControlConfig,
    mpc: MPCConfig,
    actuator: FourierActuator,
):
    """One MPPI solve with candidates sharded across the mesh ``rollout`` axis.

    Sampling and the weighted-mean update are tiny and run replicated; the
    expensive K x H rollout block is sharded. Returns
    ``(first_action, new_mean, best_cost)``.
    """
    h, d = mean.shape
    costs_fn = make_sharded_candidate_costs(mesh, grid, cfg, mpc, actuator)

    eps = jax.random.normal(key, (mpc.n_candidates, h, d), dtype=mean.dtype)
    cand = jnp.clip(mean[None] + sigma * eps, ctrl.coeff_min, ctrl.coeff_max)
    cand = cand.at[0].set(mean)
    cand = jax.device_put(cand, NamedSharding(mesh, P("rollout")))

    costs = costs_fn(state, cand)
    w = jax.nn.softmax(-(costs - jnp.min(costs)) / mpc.temperature)
    new_mean = jnp.einsum("k,khd->hd", w, cand)
    return new_mean[0], new_mean, jnp.min(costs)
