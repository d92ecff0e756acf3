"""Generic closed-loop policy evaluation rollout.

The compiled analogue of every ``run_*.py`` evaluation tail
(`/root/reference/run_ddpg.py:249-313`): roll the environment under an
arbitrary jittable ``action_fn(state_packed) -> packed coefficients`` and
record snapshots, energies and applied coefficients in one ``lax.scan``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ControlConfig, SimConfig
from ..models.pic import PlasmaState, step
from ..models.rollout import _energies
from ..ops.grid import Grid
from .actuator import FourierActuator

__all__ = ["EvalOutput", "policy_rollout"]


class EvalOutput(NamedTuple):
    final_state: PlasmaState
    field_energy: jax.Array  # (T,)
    kinetic: jax.Array
    hamiltonian: jax.Array
    coeffs: jax.Array  # (T, 2K)
    xs: Optional[jax.Array]  # (T+1, N)
    vs: Optional[jax.Array]


@partial(jax.jit, static_argnames=("action_fn", "cfg", "record_snapshots", "n_steps"))
def policy_rollout(
    state: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    actuator: FourierActuator,
    action_fn: Callable[[jax.Array], jax.Array],
    record_snapshots: bool = True,
    n_steps: Optional[int] = None,
) -> EvalOutput:
    t = n_steps if n_steps is not None else cfg.n_steps

    def body(carry: PlasmaState, _):
        s_packed = jnp.concatenate([carry.x, carry.v])
        a = action_fn(s_packed)
        new = step(carry, grid, cfg, actuator.compute_e_packed(a))
        pe, ke = _energies(new, grid, cfg)
        out = (pe, ke, a) + ((new.x, new.v) if record_snapshots else ())
        return new, out

    final, outs = jax.lax.scan(body, state, None, length=t)
    pe, ke, coeffs = outs[:3]
    if record_snapshots:
        xs = jnp.concatenate([state.x[None], outs[3]])
        vs = jnp.concatenate([state.v[None], outs[4]])
    else:
        xs = vs = None
    return EvalOutput(final, pe, ke, pe + ke, coeffs, xs, vs)
