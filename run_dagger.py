"""Amortized-MPC learned controller: DAgger-distill the sampling-MPC planner
into a single-forward-pass actor, then evaluate it closed-loop with the
standard artifact set.

This is the framework's *demonstrated* learned controller (the analogue of
the reference's committed `result/*/ddpg-control/` evidence,
`/root/reference/run_ddpg.py:249-313` + the 8-PDF set): the reference's
DDPG/PPO/SAC recipes train end-to-end here too (run_ddpg.py et al.) but their
reward design is structurally flat at reference scales (DEVNOTES, RL
findings), so the policy that actually suppresses the instability is this
one — behavior-cloned from the MPC planner with DAgger relabeling along the
learner's own trajectories and a spectral phase-space-moment encoder
(the wave dynamics' sufficient statistics; DeepSets mean-pooling loses the
phase precision the control law needs).

Usage:
  # train at the target scale and save artifacts (+ the actor weights):
  python run_dagger.py --simcase two-stream --optimize --is_save \
      --actor_path artifacts/dagger_actor_two_stream.msgpack
  # evaluate committed weights only:
  python run_dagger.py --simcase two-stream \
      --actor_path artifacts/dagger_actor_two_stream.msgpack
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from plasma_control_tpu.cli import (
    add_control_args,
    add_mpc_args,
    base_parser,
    build_control_config,
    build_mpc_config,
    build_sim_config,
    compute_cost_traces,
    run_and_save,
)
from plasma_control_tpu.control.actuator import make_actuator
from plasma_control_tpu.control.evaluate import policy_rollout
from plasma_control_tpu.control.rl.dagger import dagger_train
from plasma_control_tpu.control.rl.ddpg import DDPGConfig, make_ddpg
from plasma_control_tpu.io.checkpoint import load_params, save_params
from plasma_control_tpu.models.distributions import make_distribution
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.ops.grid import make_grid


def main():
    p = add_mpc_args(add_control_args(base_parser(
        "Learned control by amortized MPC: DAgger distillation of the sampling planner"
    )))
    p.add_argument("--optimize", action="store_true", help="train (else load --actor_path)")
    p.add_argument("--actor_path", type=str, default=None,
                   help="msgpack weights path (load for eval; save after --optimize)")
    p.add_argument("--encoder", type=str, default="spectral",
                   choices=["spectral", "deepsets", "attention"],
                   help="actor state encoder (spectral: 2.1-2.5x better "
                        "distillation; attention: mode-token transformer over "
                        "the spectral moments with per-mode output heads — "
                        "the capacity variant, experiments/actor_capacity_study.py)")
    p.add_argument("--encoder_modes", type=int, default=8)
    p.add_argument("--encoder_v_order", type=int, default=1,
                   help="velocity-moment order of the spectral encoder "
                        "(1: density+current; 2: +pressure; 3: +heat flux)")
    p.add_argument("--mlp_dim", type=int, default=64)
    p.add_argument("--dagger_iters", type=int, default=6)
    p.add_argument("--epochs_per_iter", type=int, default=400)
    args = vars(p.parse_args())
    cfg = build_sim_config(args)
    ctrl = build_control_config(args)
    mpc = build_mpc_config(args)
    hp = DDPGConfig(encoder=args["encoder"], encoder_modes=args["encoder_modes"],
                    encoder_v_order=args["encoder_v_order"], mlp_dim=args["mlp_dim"],
                    output_min=ctrl.coeff_min, output_max=ctrl.coeff_max)

    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    actuator = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode, endpoint_grid=ctrl.endpoint_grid)

    actor_path = args["actor_path"] or os.path.join(
        "artifacts", f"dagger_actor_{args['simcase'].replace('-', '_')}.msgpack"
    )

    if args["optimize"]:
        nets, params, hist = dagger_train(
            cfg, ctrl, hp, grid, actuator, jax.random.PRNGKey(cfg.seed + 7),
            n_iters=args["dagger_iters"], epochs_per_iter=args["epochs_per_iter"],
            mpc=mpc,
        )
        os.makedirs(os.path.dirname(actor_path) or ".", exist_ok=True)
        save_params(actor_path, params)
        print(f"# saved actor weights: {actor_path}")
        print(f"# per-iteration closed-loop tail PE: "
              f"{[round(v, 1) for v in hist['pe_tail']]}")
    else:
        nets, ts = make_ddpg(cfg, ctrl, hp, jax.random.PRNGKey(cfg.seed + 7))
        params = ts.actor_params
        if os.path.exists(actor_path):
            params = load_params(actor_path, params)
            print(f"# loaded actor weights: {actor_path}")
        else:
            print(f"# WARNING: {actor_path} not found; evaluating an UNTRAINED "
                  "actor (pass --optimize to train)")

    # ---- deterministic closed-loop evaluation + standard artifact set ----
    action_fn = lambda s: nets.actor.sample(params, s[None])[0]
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

    pe = np.asarray(out.field_energy)
    tail = float(np.mean(pe[-max(1, len(pe) // 5):]))
    print(f"# closed-loop tail field energy (last 20%): {tail:.2f}")

    run_and_save(
        "dagger-control", args, cfg, ctrl, snapshot, out.hamiltonian, out.field_energy,
        coeff_cos=coeff_cos, coeff_sin=coeff_sin, costs=costs, high_idx=high_idx,
    )


if __name__ == "__main__":
    main()
