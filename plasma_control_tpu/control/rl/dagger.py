"""DAgger behavior cloning of the phase-conjugate feedback expert.

A TPU-native addition that fixes the covariate-shift failure of the
reference's one-shot behavior cloning (`ddpg.py:364-405`, see DEVNOTES):
because the expert here is a *formula* (the FFT phase-conjugate law,
`run_feedback.py:130-143`), it can relabel every state the learner visits at
negligible cost. Each DAgger iteration rolls the current policy closed-loop
through the PIC dynamics (one compiled scan), records the expert action at
every visited state, aggregates, and refits the actor on the whole dataset.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ...config import ControlConfig, SimConfig
from ...models.pic import PlasmaState, init_state, step
from ...ops.grid import Grid
from ..actuator import FourierActuator
from ..feedback import feedback_rollout
from .ddpg import DDPGConfig, _Nets, _expert_action, make_ddpg

__all__ = ["collect_policy_rollout", "fit_bc", "dagger_train"]


@partial(jax.jit, static_argnames=("nets", "cfg", "ctrl", "n_steps"))
def collect_policy_rollout(
    nets: _Nets,
    actor_params,
    state0: PlasmaState,
    grid: Grid,
    actuator: FourierActuator,
    cfg: SimConfig,
    ctrl: ControlConfig,
    n_steps: int,
):
    """Roll the current policy; return (states (T, 2N), expert actions (T, A),
    field energy (T,))."""
    actor = nets.actor

    def body(carry: PlasmaState, _):
        s_packed = jnp.concatenate([carry.x, carry.v])
        a_exp = _expert_action(carry.x, grid, cfg, ctrl.max_mode)
        a = actor.sample(actor_params, s_packed[None])[0]
        new = step(carry, grid, cfg, actuator.compute_e_packed(a))
        from ...models.rollout import _energies

        pe, _ = _energies(new, grid, cfg)
        return new, (s_packed, a_exp, pe)

    _, (states, experts, pes) = jax.lax.scan(body, state0, None, length=n_steps)
    return states, experts, pes


@partial(jax.jit, static_argnames=("nets", "hp", "n_epochs"), donate_argnums=(1, 2))
def fit_bc(
    nets: _Nets,
    actor_params,
    opt_state,
    states: jax.Array,  # (D, 2N)
    actions: jax.Array,  # (D, A)
    key: jax.Array,
    hp: DDPGConfig,
    n_epochs: int,
):
    """Full-batch L2 regression of the actor onto expert actions."""
    actor, _, tx = nets

    def epoch(carry, k):
        params, opt = carry

        def loss_fn(p):
            pred = actor.sample(p, states)
            return jnp.mean(jnp.sum((actions - pred) ** 2, axis=1))

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, u), opt), l

    (params, opt), losses = jax.lax.scan(epoch, (actor_params, opt_state), jax.random.split(key, n_epochs))
    return params, opt, losses[-1]


def dagger_train(
    cfg: SimConfig,
    ctrl: ControlConfig,
    hp: DDPGConfig,
    grid: Grid,
    actuator: FourierActuator,
    key: jax.Array,
    n_iters: int = 5,
    epochs_per_iter: int = 300,
    verbose: bool = True,
):
    """DAgger loop. Returns (nets, actor_params, history).

    history['pe_tail'][i] is the closed-loop tail field energy of the policy
    at iteration i — should approach the feedback expert's.
    """
    k_net, k_env, key = jax.random.split(key, 3)
    nets, ts = make_ddpg(cfg, ctrl, hp, k_net)
    params, opt = ts.actor_params, ts.actor_opt
    n_steps = cfg.n_steps

    # iteration 0 dataset: the expert's own trajectory
    state0 = init_state(cfg, k_env)
    fb = feedback_rollout(state0, grid, cfg, ctrl, actuator, record_snapshots=True, n_steps=n_steps)
    states = jnp.concatenate([fb.xs[:-1], fb.vs[:-1]], axis=1)
    actions = jnp.concatenate([fb.coeff_cos, fb.coeff_sin], axis=1)

    history = {"bc_loss": [], "pe_tail": []}
    for it in range(n_iters):
        key, k_fit, k_env2 = jax.random.split(key, 3)
        params, opt, loss = fit_bc(nets, params, opt, states, actions, k_fit, hp, epochs_per_iter)

        roll_state = init_state(cfg, k_env2)
        s_new, a_new, pes = collect_policy_rollout(
            nets, params, roll_state, grid, actuator, cfg, ctrl, n_steps
        )
        states = jnp.concatenate([states, s_new])
        actions = jnp.concatenate([actions, a_new])

        pe_tail = float(jnp.mean(pes[-n_steps // 5 :]))
        history["bc_loss"].append(float(loss))
        history["pe_tail"].append(pe_tail)
        if verbose:
            print(f"| dagger iter {it + 1}/{n_iters} | bc_loss {float(loss):.5f} | policy PE_tail {pe_tail:.1f}")

    return nets, params, history
