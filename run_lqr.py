"""Data-driven control: Hankel-DMDc identification + LQR rollout.

A controller family beyond the reference: identify a linear time-delay model
of the Fourier-mode dynamics from excitation rollouts, then run the LQR
policy closed loop at feedback-law cost.

Usage: python run_lqr.py --simcase two-stream --max_mode 3 --is_save
"""

import jax
import numpy as np

from plasma_control_tpu.cli import (
    add_control_args,
    base_parser,
    build_control_config,
    build_sim_config,
    compute_cost_traces,
    run_and_save,
)
from plasma_control_tpu.control.actuator import make_actuator
from plasma_control_tpu.control.sysid import identify_lqr_controller, lqr_rollout
from plasma_control_tpu.models.distributions import make_distribution
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.models.rollout import rollout
from plasma_control_tpu.ops.grid import make_grid


def main():
    p = add_control_args(base_parser("PIC simulation with identified-model LQR E-field control"))
    p.add_argument("--n_lags", type=int, default=6)
    p.add_argument("--n_excite_rollouts", type=int, default=6)
    p.add_argument("--excite_steps", type=int, default=150)
    p.add_argument("--excite_amplitude", type=float, default=0.15)
    p.add_argument("--q_weight", type=float, default=1.0)
    p.add_argument("--r_weight", type=float, default=0.5)
    args = vars(p.parse_args())
    cfg = build_sim_config(args)
    ctrl = build_control_config(args)

    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    actuator = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode, endpoint_grid=ctrl.endpoint_grid)

    gain, info = identify_lqr_controller(
        grid, actuator, cfg, ctrl, jax.random.PRNGKey(cfg.seed + 7),
        n_lags=args["n_lags"], n_rollouts=args["n_excite_rollouts"],
        excite_steps=args["excite_steps"], amplitude=args["excite_amplitude"],
        q_weight=args["q_weight"], r_weight=args["r_weight"],
    )
    print(f"# identified model: residual {info['residual']:.4f}, spectral radius {info['spectral_radius']:.4f}")

    state = init_state(cfg, jax.random.PRNGKey(cfg.seed))
    out = lqr_rollout(state, gain, grid, actuator, cfg, ctrl, n_lags=args["n_lags"], n_steps=cfg.n_steps)

    replay = rollout(
        state, grid, cfg,
        e_external_traj=actuator.compute_e_packed(out.coeffs),
        record_snapshots=True,
    )
    snapshot = np.concatenate([np.asarray(replay.xs).T, np.asarray(replay.vs).T], axis=0)
    coeffs = np.asarray(out.coeffs)
    coeff_cos = coeffs[:, : ctrl.max_mode].T
    coeff_sin = coeffs[:, ctrl.max_mode :].T
    costs = compute_cost_traces(snapshot, cfg, ctrl, coeffs=coeffs)

    high_idx = None
    if cfg.simcase == "bump-on-tail":
        high_idx = np.asarray(make_distribution(cfg).high_indices())

    run_and_save(
        "lqr-control", args, cfg, ctrl, snapshot, replay.hamiltonian, replay.field_energy,
        coeff_cos=coeff_cos, coeff_sin=coeff_sin, costs=costs, high_idx=high_idx,
    )


if __name__ == "__main__":
    main()
