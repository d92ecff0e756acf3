"""PPO in JAX/Flax/optax, fully-compiled episodes.

Capability parity with `/root/reference/src/control/rl/ppo.py:132-395`: shared
actor-critic trunk with learned global log_std, GAE(gamma, lam), clipped
surrogate + Huber value + entropy loss with k_epoch inner epochs over an
on-policy chunk of ``chunk_size`` (= the reference's buffer "capacity" 8,
`run_ppo.py:67`), updating whenever the chunk fills.

Reference quirks preserved (auditable):
* the inner epochs *re-sample* fresh actions and use their log-probs in the
  ratio instead of evaluating the stored actions (`ppo.py:206-210`);
* the offline warm-start performs a single gradient step on ``-sum(l2)``
  (anti-BC — maximizing distance to the expert; almost certainly a sign bug,
  `ppo.py:292-299`). Controlled by ``anti_bc_warmstart`` (default True for
  parity; set False for the sane behavior of skipping it).
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
from ..feedback import feedback_rollout
from ..reward import Reward
from .networks import PPOActorCritic

__all__ = ["PPOConfig", "make_ppo", "compute_gae", "update_policy", "train"]


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Reference CLI defaults (`/root/reference/run_ppo.py:59-78`)."""

    mlp_dim: int = 32
    lr: float = 5e-4
    gamma: float = 0.995  # --r
    lam: float = 0.95
    std_init: float = 0.5
    chunk_size: int = 8  # --capacity
    eps_clip: float = 0.25
    entropy_coeff: float = 0.01
    value_coeff: float = 0.20
    k_epoch: int = 4
    num_episodes: int = 200
    output_min: float = -1.0
    output_max: float = 1.0
    alpha: float = 0.1
    beta: float = 0.0
    anti_bc_warmstart: bool = True
    reward_shape: str = "reference"  # or "shaped" (Reward.compute_reward_shaped)


class PPOState(NamedTuple):
    params: dict
    opt: optax.OptState


class _Nets(NamedTuple):
    policy: PPOActorCritic
    tx: optax.GradientTransformation


def make_ppo(cfg: SimConfig, ctrl: ControlConfig, hp: PPOConfig, key: jax.Array):
    policy = PPOActorCritic(
        mlp_dim=hp.mlp_dim,
        n_actions=ctrl.n_actions,
        std_init=hp.std_init,
        output_min=hp.output_min,
        output_max=hp.output_max,
        length=cfg.length,
    )
    params = policy.init(key, jnp.zeros((1, 2 * cfg.n_particles)))
    tx = optax.chain(optax.clip_by_global_norm(0.5), optax.adam(hp.lr))
    return _Nets(policy=policy, tx=tx), PPOState(params=params, opt=tx.init(params))


def compute_gae(rewards, values, dones, next_values, gamma=0.995, lam=0.95):
    """GAE as a reverse scan (parity with `ppo.py:132-152`)."""

    def body(gae, inp):
        r, v, d, nv = inp
        delta = r + gamma * nv * (1.0 - d) - v
        gae = delta + gamma * lam * (1.0 - d) * gae
        return gae, gae

    _, adv = jax.lax.scan(body, jnp.zeros(()), (rewards, values, dones, next_values), reverse=True)
    return adv, adv + values


def update_policy(nets: _Nets, ts: PPOState, chunk, key: jax.Array, hp: PPOConfig):
    """k_epoch clipped-surrogate updates over one on-policy chunk
    (parity with `ppo.py:154-229`)."""
    policy, tx = nets
    s, s2, logp_old, r, d = chunk

    _, _, values = policy.apply(ts.params, s)
    _, _, next_values = policy.apply(ts.params, s2)
    adv, returns = compute_gae(r, values[:, 0], d, next_values[:, 0], hp.gamma, hp.lam)
    td_target = jax.lax.stop_gradient(adv)[:, None]
    returns = jax.lax.stop_gradient(returns)

    def one_epoch(carry, k):
        params, opt = carry

        def loss_fn(p):
            _, entropy, logp, value = policy.sample(params=p, x=s, key=k)
            delta = td_target - value
            ratio = jnp.exp(logp - jax.lax.stop_gradient(logp_old))
            surr1 = ratio * delta
            surr2 = jnp.clip(ratio, 1 - hp.eps_clip, 1 + hp.eps_clip) * delta
            p_loss = -jnp.mean(jnp.minimum(surr1, surr2))
            v_loss = hp.value_coeff * jnp.mean(optax.losses.huber_loss(value[:, 0], returns))
            e_loss = -hp.entropy_coeff * entropy
            return p_loss + v_loss + e_loss

        l, g = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(g, opt, params)
        return (optax.apply_updates(params, u), opt), l

    (params, opt), losses = jax.lax.scan(
        one_epoch, (ts.params, ts.opt), jax.random.split(key, hp.k_epoch)
    )
    return PPOState(params=params, opt=opt), jnp.mean(losses)


@partial(jax.jit, static_argnames=("nets", "cfg", "ctrl", "hp", "n_steps"), donate_argnums=(1,))
def run_episode(
    nets: _Nets,
    ts: PPOState,
    state0: PlasmaState,
    reward_feq: jax.Array,
    key: jax.Array,
    grid: Grid,
    actuator: FourierActuator,
    cfg: SimConfig,
    ctrl: ControlConfig,
    hp: PPOConfig,
    n_steps: int,
):
    """One fully-compiled online episode (`ppo.py:306-372`)."""
    policy = nets.policy
    reward_cls = Reward(
        jnp.concatenate([state0.x, state0.v]), ctrl.reward_n_mesh, cfg.length,
        ctrl.vmin, ctrl.vmax, cfg.n0, hp.alpha, hp.beta, ctrl.n_actions,
    )
    reward_cls.feq = reward_feq
    c = hp.chunk_size
    sdim = 2 * cfg.n_particles

    chunk0 = (
        jnp.zeros((c, sdim)),
        jnp.zeros((c, sdim)),
        jnp.zeros((c, 1)),
        jnp.zeros((c,)),
        jnp.zeros((c,)),
    )

    def body(carry, inp):
        env, ts, chunk = carry
        t, k = inp
        k_act, k_up = jax.random.split(k)

        s_packed = jnp.concatenate([env.x, env.v])
        a, _, logp, _ = policy.sample(params=ts.params, x=s_packed[None], key=k_act)
        a = a[0]
        env2 = step(env, grid, cfg, actuator.compute_e_packed(a))
        s2_packed = jnp.concatenate([env2.x, env2.v])
        r = reward_cls.reward_fn(hp.reward_shape)(s_packed, a)
        done = jnp.where(t == n_steps - 1, 1.0, 0.0)

        slot = t % c
        chunk = (
            chunk[0].at[slot].set(s_packed),
            chunk[1].at[slot].set(s2_packed),
            chunk[2].at[slot].set(logp[0]),
            chunk[3].at[slot].set(r),
            chunk[4].at[slot].set(done),
        )

        def yes(args):
            ts, chunk = args
            ts2, loss = update_policy(nets, ts, chunk, k_up, hp)
            return ts2, loss

        def no(args):
            ts, _ = args
            return ts, jnp.zeros(())

        full = slot == c - 1
        ts, loss = jax.lax.cond(full, yes, no, (ts, chunk))
        return (env2, ts, chunk), (r, loss, full)

    keys = jax.random.split(key, n_steps)
    (_, ts, _), (rs, losses, fulls) = jax.lax.scan(
        body, (state0, ts, chunk0), (jnp.arange(n_steps), keys)
    )
    n_upd = jnp.maximum(jnp.sum(fulls), 1)
    metrics = {
        "reward_mean": jnp.sum(rs * fulls) / n_upd,
        "loss": jnp.sum(losses) / n_upd,
        "reward_total": jnp.sum(rs),
    }
    return ts, metrics


def train(
    cfg: SimConfig,
    ctrl: ControlConfig,
    hp: PPOConfig,
    grid: Grid,
    actuator: FourierActuator,
    key: jax.Array,
    num_episodes: Optional[int] = None,
    verbose: int = 10,
    ckpt_path: Optional[str] = None,
    ckpt_every: int = 10,
    resume: bool = True,
):
    """Offline warm-start + online episodes (parity with ``train``,
    `ppo.py:231-395`). ``ckpt_path`` checkpoints the complete training state
    (params, optimizer moments, RNG key) for exact resume; PPO is on-policy so
    there is no buffer to persist."""
    import numpy as np

    k_init, k_net, k_bc, k_run = jax.random.split(key, 4)
    state0 = init_state(cfg, k_init)
    nets, ts = make_ppo(cfg, ctrl, hp, k_net)
    n_steps = cfg.n_steps

    init_packed = jnp.concatenate([state0.x, state0.v])
    reward_cls = Reward(
        init_packed, ctrl.reward_n_mesh, cfg.length, ctrl.vmin, ctrl.vmax, cfg.n0,
        hp.alpha, hp.beta, ctrl.n_actions,
    )

    # Attempt resume BEFORE the warm start: a restored checkpoint would
    # overwrite the warm-started params, so the expert rollout is skipped
    # entirely on resume.
    ep0, ck = 0, None
    if ckpt_path and resume:
        from ...io.resume import restore_train_checkpoint

        ck = restore_train_checkpoint(ckpt_path, ts, None, k_run, ts.params)

    if ck is None and hp.anti_bc_warmstart:
        # single -sum(l2) step toward/away from the expert (`ppo.py:292-299`)
        fb = feedback_rollout(state0, grid, cfg, ctrl, actuator, record_snapshots=True, n_steps=n_steps)
        states_bc = jnp.concatenate([fb.xs[:-1], fb.vs[:-1]], axis=1)
        actions_bc = jnp.concatenate([fb.coeff_cos, fb.coeff_sin], axis=1)

        def loss_fn(p):
            pred, _, _, _ = nets.policy.sample(params=p, x=states_bc, key=k_bc)
            return -jnp.sum(jnp.sum((actions_bc - pred) ** 2, axis=1))

        _, g = jax.value_and_grad(loss_fn)(ts.params)
        u, opt = nets.tx.update(g, ts.opt, ts.params)
        ts = PPOState(params=optax.apply_updates(ts.params, u), opt=opt)

    episodes = num_episodes if num_episodes is not None else hp.num_episodes
    hist = {"reward": [], "loss": []}
    best_reward, best_params = None, jax.tree.map(jnp.copy, ts.params)

    if ck is not None:
        ts, k_run = ck["ts"], ck["key"]
        ep0, hist = ck["ep_done"], ck["hist"]
        best_reward, best_params = ck["best_reward"], ck["best_params"]
        print(f"# resumed PPO training from {ckpt_path} at episode {ep0}")

    for ep in range(ep0, episodes):
        k_run, k_ep, k_env = jax.random.split(k_run, 3)
        ep_state = init_state(cfg, k_env)
        ts, m = run_episode(nets, ts, ep_state, reward_cls.feq, k_ep, grid, actuator, cfg, ctrl, hp, n_steps)
        rm = float(m["reward_mean"])
        hist["reward"].append(rm)
        hist["loss"].append(float(m["loss"]))
        if best_reward is None or rm > best_reward:
            best_reward = rm
            best_params = jax.tree.map(jnp.copy, ts.params)
        if ckpt_path and ((ep + 1) % ckpt_every == 0 or ep == episodes - 1):
            from ...io.resume import save_train_checkpoint

            save_train_checkpoint(ckpt_path, ts, None, k_run, ep + 1, hist, best_reward, best_params)
        if verbose and ep % verbose == 0:
            print(f"| episode:{ep + 1} | loss:{hist['loss'][-1]:.4f} | reward:{rm:.4f}")

    hist = {k: np.asarray(v) for k, v in hist.items()}
    return nets, ts, best_params, hist
