"""Shared RL run-script machinery: train (optional) + deterministic
closed-loop evaluation + artifact dump, mirroring the skeleton of
`/root/reference/run_ddpg.py:135-388` / ``run_ppo.py`` / ``run_sac.py``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from .cli import compute_cost_traces, run_and_save
from .config import ControlConfig, SimConfig
from .control.actuator import make_actuator
from .control.evaluate import policy_rollout
from .io.checkpoint import load_params, save_params
from .models.distributions import make_distribution
from .models.pic import init_state
from .ops.grid import make_grid
from .viz.plots import plot_loss_curve


def run_rl(algo: str, args: dict, cfg: SimConfig, ctrl: ControlConfig, hp):
    """Train (if --optimize) then evaluate the policy closed-loop and save the
    reference's artifact set under ``<tag>-control``."""
    tag = f"{algo}-control"
    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    actuator = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode, endpoint_grid=ctrl.endpoint_grid)
    key = jax.random.PRNGKey(cfg.seed)

    ckpt_dir = os.path.join(args["save_file"], args["simcase"], tag)
    os.makedirs(ckpt_dir, exist_ok=True)
    best_path = args.get("save_best") or os.path.join(ckpt_dir, f"{algo}_best.msgpack")
    last_path = args.get("save_last") or os.path.join(ckpt_dir, f"{algo}_last.msgpack")

    if algo == "ddpg":
        from .control.rl.ddpg import train

        actor_of = lambda nets: nets.actor
        params_of = lambda ts: ts.actor_params
    elif algo == "ppo":
        from .control.rl.ppo import train

        actor_of = lambda nets: nets.policy
        params_of = lambda ts: ts.params
    elif algo == "sac":
        from .control.rl.sac import train

        actor_of = lambda nets: nets.actor
        params_of = lambda ts: ts.actor_params
    else:
        raise ValueError(algo)

    if args.get("optimize"):
        train_kwargs = dict(num_episodes=args.get("num_episode"), verbose=args.get("verbose", 10))
        # either flag alone enables full-state checkpointing (a bare
        # --checkpoint_path must resume as documented; default cadence 10)
        if args.get("checkpoint_every") or args.get("checkpoint_path"):
            train_kwargs.update(
                ckpt_path=args.get("checkpoint_path") or os.path.join(ckpt_dir, "train_ckpt"),
                ckpt_every=args.get("checkpoint_every") or 10,
                resume=not args.get("no_resume"),
            )
        if algo == "ddpg":
            train_kwargs.update(save_best=best_path)  # periodic persistence
        nets, ts, best_params, hist = train(cfg, ctrl, hp, grid, actuator, key, **train_kwargs)
        save_params(best_path, best_params)
        save_params(last_path, params_of(ts))
        savepath = os.path.join(args["save_plot"], args["simcase"], tag)
        loss_keys = [k for k in hist if k != "reward"]
        plot_loss_curve({k: hist[k] for k in loss_keys}, savepath, "loss_curve.pdf")
        plot_loss_curve({"reward": hist["reward"]}, savepath, "reward_curve.pdf")
        eval_params = best_params
        actor = actor_of(nets)
    else:
        # build fresh nets and load weights if present
        if algo == "ddpg":
            from .control.rl.ddpg import make_ddpg

            nets, ts = make_ddpg(cfg, ctrl, hp, key)
        elif algo == "ppo":
            from .control.rl.ppo import make_ppo

            nets, ts = make_ppo(cfg, ctrl, hp, key)
        else:
            from .control.rl.sac import make_sac

            nets, ts = make_sac(cfg, ctrl, hp, key)
        actor = actor_of(nets)
        eval_params = params_of(ts)
        if os.path.exists(best_path):
            eval_params = load_params(best_path, eval_params)
            print(f"# loaded weights from {best_path}")
        else:
            print("# no trained weights found; evaluating the untrained policy (pass --optimize to train)")

    # ---- deterministic closed-loop evaluation (`run_ddpg.py:249-313`) ----
    if algo == "ppo":
        action_fn = lambda s: actor.sample(params=eval_params, x=s[None], deterministic=True)[0][0]
    elif algo == "sac":
        action_fn = lambda s: actor.sample(eval_params, s[None], deterministic=True)[0][0]
    else:
        action_fn = lambda s: actor.sample(eval_params, s[None])[0]

    state = init_state(cfg, jax.random.PRNGKey(cfg.seed))
    out = policy_rollout(state, grid, cfg, actuator, action_fn, record_snapshots=True)

    snapshot = np.concatenate([np.asarray(out.xs).T, np.asarray(out.vs).T], axis=0)
    coeffs = np.asarray(out.coeffs)
    coeff_cos = coeffs[:, : ctrl.max_mode].T
    coeff_sin = coeffs[:, ctrl.max_mode :].T
    costs = compute_cost_traces(snapshot, cfg, ctrl, coeffs=coeffs)

    high_idx = None
    if cfg.simcase == "bump-on-tail":
        high_idx = np.asarray(make_distribution(cfg).high_indices())

    run_and_save(
        tag, args, cfg, ctrl, snapshot, out.hamiltonian, out.field_energy,
        coeff_cos=coeff_cos, coeff_sin=coeff_sin, costs=costs, high_idx=high_idx,
    )
