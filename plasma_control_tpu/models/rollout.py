"""Compiled rollouts: ``lax.scan`` over time, ``vmap`` over candidates.

This is ``PIC.simulate`` (`/root/reference/src/env/pic.py:175-223`) reborn as a
single compiled program (SURVEY §3.5). The per-step Python loop, tqdm bar and
repeated host-side energy recomputations of the reference are replaced by one
scan whose carry is the particle state and whose outputs are the diagnostic
time series; snapshot recording is optional to keep HBM traffic minimal.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import SimConfig
from ..ops.deposit import deposit
from ..ops.fields import electric_energy, kinetic_energy, solve_e_mesh
from ..ops.grid import Grid
from .pic import PlasmaState, step

__all__ = ["RolloutOutput", "rollout", "rollout_batch", "snapshot_from_rollout"]


class RolloutOutput(NamedTuple):
    final_state: PlasmaState
    field_energy: jax.Array  # (T+1,) PE(t), self-consistent field
    kinetic: jax.Array  # (T+1,)
    hamiltonian: jax.Array  # (T+1,)
    xs: Optional[jax.Array]  # (T+1, N) if recorded
    vs: Optional[jax.Array]  # (T+1, N) if recorded


def _energies(state: PlasmaState, grid: Grid, cfg: SimConfig):
    n = deposit(state.x, grid, n0=cfg.n0, kind=cfg.interpol, method=cfg.deposit_method)
    e_mesh = solve_e_mesh(n, grid, cfg.n0)
    pe = electric_energy(e_mesh, grid, cfg.n_particles)
    ke = kinetic_energy(state.v)
    return pe, ke


@partial(jax.jit, static_argnames=("cfg", "record_snapshots", "n_steps"))
def rollout(
    state: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    e_external_traj: Optional[jax.Array] = None,
    record_snapshots: bool = False,
    n_steps: Optional[int] = None,
) -> RolloutOutput:
    """Open-loop rollout for ``n_steps`` (default ``cfg.n_steps``).

    ``e_external_traj``: optional (T, M) per-step external mesh field held
    constant within each step (zero-order hold), like the per-step list in
    `/root/reference/src/env/pic.py:196-201`.

    Energies are recorded for the initial state and after every step,
    matching the reference's (Nt+1)-long series (`pic.py:190-213`).
    """
    t = n_steps if n_steps is not None else cfg.n_steps

    def body(carry: PlasmaState, e_ext):
        new = step(carry, grid, cfg, e_ext)
        pe, ke = _energies(new, grid, cfg)
        out = (pe, ke) + ((new.x, new.v) if record_snapshots else ())
        return new, out

    if e_external_traj is None:
        xs_in = jnp.zeros((t, grid.n_mesh), dtype=state.x.dtype)
    else:
        xs_in = e_external_traj[:t]

    final, outs = jax.lax.scan(body, state, xs_in)
    pe_t, ke_t = outs[0], outs[1]

    pe0, ke0 = _energies(state, grid, cfg)
    pe_all = jnp.concatenate([pe0[None], pe_t])
    ke_all = jnp.concatenate([ke0[None], ke_t])

    if record_snapshots:
        xs = jnp.concatenate([state.x[None], outs[2]])
        vs = jnp.concatenate([state.v[None], outs[3]])
    else:
        xs = vs = None

    return RolloutOutput(
        final_state=final,
        field_energy=pe_all,
        kinetic=ke_all,
        hamiltonian=pe_all + ke_all,
        xs=xs,
        vs=vs,
    )


def rollout_batch(
    states: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    e_external_trajs: Optional[jax.Array] = None,
    n_steps: Optional[int] = None,
) -> RolloutOutput:
    """vmap of :func:`rollout` over a leading candidate/batch axis.

    ``states`` has leaves of shape (B, N); ``e_external_trajs`` is (B, T, M).
    This is the data-parallel primitive the MPC solver and the device mesh
    shard (SURVEY §2.6) — the reference has no batched rollout capability.
    """
    fn = partial(rollout, grid=grid, cfg=cfg, record_snapshots=False, n_steps=n_steps)
    if e_external_trajs is None:
        return jax.vmap(lambda s: fn(s))(states)
    return jax.vmap(lambda s, e: fn(s, e_external_traj=e))(states, e_external_trajs)


def snapshot_from_rollout(out: RolloutOutput) -> jax.Array:
    """(2N, T+1) packed snapshot matching the reference layout
    (`/root/reference/src/env/pic.py:216-218`)."""
    assert out.xs is not None, "rollout(record_snapshots=True) required"
    return jnp.concatenate([out.xs.T, out.vs.T], axis=0)
