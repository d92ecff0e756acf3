"""SAC in JAX/Flax/optax, fully-compiled episodes.

Capability parity with `/root/reference/src/control/rl/sac.py:190-418`:
entropy-regularized twin-Q targets, learned temperature via ``log_alpha``
with target entropy -n_actions (`run_sac.py:168-169`), reward batch
normalization, Bellman-target clamp to ±1e3, Polyak target updates; online
only (no BC stage). Updates fire when the buffer holds >= batch_size
transitions, every ``batch_size // 4`` steps (`sac.py:370`).

Reference quirks preserved: the entropy bonus uses the Gaussian
distribution's *mean scalar entropy* (not per-sample -log pi; `sac.py:126`,
`sac.py:243`), and the reward passed to ``compute_reward`` is the external
*mesh field* rather than the coefficient vector (`sac.py:361`), making the
input-energy term sum(E_in^2)*L/4 on the mesh.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ...config import ControlConfig, SimConfig
from ...models.pic import PlasmaState, init_state, step
from ...ops.grid import Grid
from ..actuator import FourierActuator
from ..reward import Reward
from .buffer import buffer_init, buffer_push, buffer_sample
from .networks import SACActor, SACCritic

__all__ = ["SACConfig", "make_sac", "update_policy", "train"]


@dataclasses.dataclass(frozen=True)
class SACConfig:
    """Reference CLI defaults (`/root/reference/run_sac.py:57-73`)."""

    mlp_dim: int = 32
    lr: float = 5e-4
    gamma: float = 0.995  # --r
    tau: float = 0.5  # --tau (reference's unusually large Polyak rate)
    capacity: int = 256
    batch_size: int = 128
    num_episodes: int = 1000
    output_min: float = -1.0
    output_max: float = 1.0
    alpha: float = 1.0  # reward weight (`run_sac.py:73`)
    bellman_clamp: float = 1e3
    reward_shape: str = "reference"  # or "shaped" (Reward.compute_reward_shaped)


class SACState(NamedTuple):
    actor_params: dict
    critic_params: dict
    target_critic_params: dict
    log_alpha: jax.Array
    actor_opt: optax.OptState
    critic_opt: optax.OptState
    alpha_opt: optax.OptState


class _Nets(NamedTuple):
    actor: SACActor
    critic: SACCritic
    tx: optax.GradientTransformation
    tx_alpha: optax.GradientTransformation


def make_sac(cfg: SimConfig, ctrl: ControlConfig, hp: SACConfig, key: jax.Array):
    actor = SACActor(
        mlp_dim=hp.mlp_dim, n_actions=ctrl.n_actions,
        output_min=hp.output_min, output_max=hp.output_max,
    )
    critic = SACCritic(mlp_dim=hp.mlp_dim)
    dummy_s = jnp.zeros((1, 2 * cfg.n_particles))
    dummy_a = jnp.zeros((1, ctrl.n_actions))
    ka, kc = jax.random.split(key)
    actor_params = actor.init(ka, dummy_s)
    critic_params = critic.init(kc, dummy_s, dummy_a)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(hp.lr))
    tx_alpha = optax.adam(hp.lr)
    log_alpha = jnp.zeros(())
    state = SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=jax.tree.map(jnp.copy, critic_params),
        log_alpha=log_alpha,
        actor_opt=tx.init(actor_params),
        critic_opt=tx.init(critic_params),
        alpha_opt=tx_alpha.init(log_alpha),
    )
    return _Nets(actor=actor, critic=critic, tx=tx, tx_alpha=tx_alpha), state


def update_policy(nets: _Nets, ts: SACState, batch, key: jax.Array, hp: SACConfig, target_entropy: float):
    """One SAC update (parity with ``update_policy``, `sac.py:190-295`)."""
    s, a, s2, r, d, _ = batch
    actor, critic, tx, tx_alpha = nets

    # reward batch normalization (`sac.py:229-230`)
    r = (r - jnp.mean(r)) / (jnp.std(r) + 1e-6)
    alpha = jnp.exp(ts.log_alpha)

    k1, k2 = jax.random.split(key)
    next_a, next_entropy, _ = actor.sample(ts.actor_params, s2, key=k1)
    nq1, nq2 = critic.apply(ts.target_critic_params, s2, next_a)
    # reference masks terminal next-states out of the bootstrap (`sac.py:246`)
    next_q = (jnp.minimum(nq1, nq2) + alpha * next_entropy) * (1.0 - d[:, None])
    target = jnp.clip(r[:, None] + hp.gamma * next_q, -hp.bellman_clamp, hp.bellman_clamp)
    target = jax.lax.stop_gradient(target)

    def q_loss_fn(p):
        q1, q2 = critic.apply(p, s, a)
        l1 = jnp.mean(optax.losses.huber_loss(q1, target))
        l2 = jnp.mean(optax.losses.huber_loss(q2, target))
        return l1 + l2, (l1, l2)

    (_, (q1_l, q2_l)), gq = jax.value_and_grad(q_loss_fn, has_aux=True)(ts.critic_params)
    uq, critic_opt = tx.update(gq, ts.critic_opt, ts.critic_params)
    critic_params = optax.apply_updates(ts.critic_params, uq)

    def p_loss_fn(p):
        a_pi, entropy, _ = actor.sample(p, s, key=k2)
        q1_pi, q2_pi = critic.apply(critic_params, s, a_pi)
        q = jax.lax.stop_gradient(jnp.minimum(q1_pi, q2_pi))
        # NB the reference detaches q, so the actor gradient flows only
        # through the entropy term (`sac.py:269-271`) — preserved.
        return -jnp.mean(q + entropy * jax.lax.stop_gradient(alpha)), entropy

    (p_l, entropy), gp = jax.value_and_grad(p_loss_fn, has_aux=True)(ts.actor_params)
    up, actor_opt = tx.update(gp, ts.actor_opt, ts.actor_params)
    actor_params = optax.apply_updates(ts.actor_params, up)

    def a_loss_fn(la):
        return -jnp.mean(la * jax.lax.stop_gradient(target_entropy - entropy))

    ga = jax.grad(a_loss_fn)(ts.log_alpha)
    ua, alpha_opt = tx_alpha.update(ga, ts.alpha_opt, ts.log_alpha)
    log_alpha = optax.apply_updates(ts.log_alpha, ua)

    new_ts = SACState(
        actor_params=actor_params,
        critic_params=critic_params,
        target_critic_params=optax.incremental_update(critic_params, ts.target_critic_params, hp.tau),
        log_alpha=log_alpha,
        actor_opt=actor_opt,
        critic_opt=critic_opt,
        alpha_opt=alpha_opt,
    )
    return new_ts, q1_l, q2_l, p_l


@partial(jax.jit, static_argnames=("nets", "cfg", "ctrl", "hp", "n_steps"), donate_argnums=(1, 2))
def run_episode(
    nets: _Nets,
    ts: SACState,
    buf,
    state0: PlasmaState,
    reward_feq: jax.Array,
    key: jax.Array,
    grid: Grid,
    actuator: FourierActuator,
    cfg: SimConfig,
    ctrl: ControlConfig,
    hp: SACConfig,
    n_steps: int,
):
    """One fully-compiled online episode (`sac.py:328-397`)."""
    actor = nets.actor
    target_entropy = float(-ctrl.n_actions)
    reward_cls = Reward(
        jnp.concatenate([state0.x, state0.v]), ctrl.reward_n_mesh, cfg.length,
        ctrl.vmin, ctrl.vmax, cfg.n0, hp.alpha, 1.0, ctrl.n_actions,
    )
    reward_cls.feq = reward_feq
    update_every = max(hp.batch_size // 4, 1)

    def body(carry, inp):
        env, buf, ts = carry
        t, k = inp
        k_act, k_up = jax.random.split(k)

        s_packed = jnp.concatenate([env.x, env.v])
        a, _, _ = actor.sample(ts.actor_params, s_packed[None], key=k_act)
        a = a[0]
        e_ext = actuator.compute_e_packed(a)
        env2 = step(env, grid, cfg, e_ext)
        s2_packed = jnp.concatenate([env2.x, env2.v])
        # SAC passes the mesh field to the reward (`sac.py:361`)
        r = reward_cls.reward_fn(hp.reward_shape)(s_packed, e_ext)
        done = jnp.where(t == n_steps - 1, 1.0, 0.0)
        buf = buffer_push(buf, s_packed, a, s2_packed, r, done)

        do_update = (buf.size >= hp.batch_size) & (t % update_every == 0)

        def yes(args):
            ts, buf = args
            batch = buffer_sample(buf, k_up, hp.batch_size)
            ts2, q1l, q2l, pl = update_policy(nets, ts, batch, k_up, hp, target_entropy)
            return ts2, q1l, q2l, pl

        def no(args):
            ts, _ = args
            z = jnp.zeros(())
            return ts, z, z, z

        ts, q1l, q2l, pl = jax.lax.cond(do_update, yes, no, (ts, buf))
        return (env2, buf, ts), (r, q1l, q2l, pl, do_update)

    keys = jax.random.split(key, n_steps)
    (_, buf, ts), (rs, q1s, q2s, ps, upd) = jax.lax.scan(
        body, (state0, buf, ts), (jnp.arange(n_steps), keys)
    )
    n_upd = jnp.maximum(jnp.sum(upd), 1)
    metrics = {
        "reward_mean": jnp.sum(rs * upd) / n_upd,
        "q1_loss": jnp.sum(q1s) / n_upd,
        "q2_loss": jnp.sum(q2s) / n_upd,
        "p_loss": jnp.sum(ps) / n_upd,
        "n_updates": jnp.sum(upd),
        "reward_total": jnp.sum(rs),
    }
    return ts, buf, metrics


def train(
    cfg: SimConfig,
    ctrl: ControlConfig,
    hp: SACConfig,
    grid: Grid,
    actuator: FourierActuator,
    key: jax.Array,
    num_episodes: Optional[int] = None,
    verbose: int = 10,
    ckpt_path: Optional[str] = None,
    ckpt_every: int = 10,
    resume: bool = True,
):
    """Online-only training (parity with ``train``, `sac.py:291-418`).
    ``ckpt_path`` checkpoints the complete training state (networks, optimizer
    moments, temperature, buffer, RNG key) for exact resume."""
    import numpy as np

    k_init, k_net, k_run = jax.random.split(key, 3)
    state0 = init_state(cfg, k_init)
    nets, ts = make_sac(cfg, ctrl, hp, k_net)
    n_steps = cfg.n_steps

    init_packed = jnp.concatenate([state0.x, state0.v])
    reward_cls = Reward(
        init_packed, ctrl.reward_n_mesh, cfg.length, ctrl.vmin, ctrl.vmax, cfg.n0,
        hp.alpha, 1.0, ctrl.n_actions,
    )
    buf = buffer_init(hp.capacity, 2 * cfg.n_particles, ctrl.n_actions)

    episodes = num_episodes if num_episodes is not None else hp.num_episodes
    hist = {"reward": [], "q1_loss": [], "q2_loss": [], "p_loss": []}
    best_reward, best_params = None, jax.tree.map(jnp.copy, ts.actor_params)

    ep0 = 0
    if ckpt_path and resume:
        from ...io.resume import restore_train_checkpoint

        ck = restore_train_checkpoint(ckpt_path, ts, buf, k_run, best_params)
        if ck is not None:
            ts, buf, k_run = ck["ts"], ck["buf"], ck["key"]
            ep0, hist = ck["ep_done"], ck["hist"]
            best_reward, best_params = ck["best_reward"], ck["best_params"]
            print(f"# resumed SAC training from {ckpt_path} at episode {ep0}")

    for ep in range(ep0, episodes):
        k_run, k_ep, k_env = jax.random.split(k_run, 3)
        ep_state = init_state(cfg, k_env)
        ts, buf, m = run_episode(
            nets, ts, buf, ep_state, reward_cls.feq, k_ep, grid, actuator, cfg, ctrl, hp, n_steps
        )
        rm = float(m["reward_mean"])
        hist["reward"].append(rm)
        hist["q1_loss"].append(float(m["q1_loss"]))
        hist["q2_loss"].append(float(m["q2_loss"]))
        hist["p_loss"].append(float(m["p_loss"]))
        if int(m["n_updates"]) > 0 and (best_reward is None or rm > best_reward):
            best_reward = rm
            best_params = jax.tree.map(jnp.copy, ts.actor_params)
        if ckpt_path and ((ep + 1) % ckpt_every == 0 or ep == episodes - 1):
            from ...io.resume import save_train_checkpoint

            save_train_checkpoint(ckpt_path, ts, buf, k_run, ep + 1, hist, best_reward, best_params)
        if verbose and ep % verbose == 0:
            print(f"| episode:{ep + 1} | p_loss:{hist['p_loss'][-1]:.4f} | reward:{rm:.4f}")

    hist = {k: np.asarray(v) for k, v in hist.items()}
    return nets, ts, best_params, hist
