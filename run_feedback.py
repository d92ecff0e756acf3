"""Closed-loop FFT phase-conjugate feedback control.

Entry-point parity with `/root/reference/run_feedback.py` (law:
a_n = -Re Ek_n, b_n = +Im Ek_n; same artifacts), fully compiled.

Usage: python run_feedback.py --simcase two-stream --max_mode 3 --is_save
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
from plasma_control_tpu.control.feedback import feedback_rollout
from plasma_control_tpu.models.distributions import make_distribution
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.ops.grid import make_grid


def main():
    p = add_control_args(base_parser("PIC simulation with feedback E-field control (Fourier transform)"))
    args = vars(p.parse_args())
    cfg = build_sim_config(args)
    ctrl = build_control_config(args)

    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    actuator = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode, endpoint_grid=ctrl.endpoint_grid)
    state = init_state(cfg, jax.random.PRNGKey(cfg.seed))

    fb = feedback_rollout(state, grid, cfg, ctrl, actuator, record_snapshots=True)
    snapshot = np.concatenate([np.asarray(fb.xs).T, np.asarray(fb.vs).T], axis=0)
    coeff_cos = np.asarray(fb.coeff_cos).T  # (K, T) like the reference stacking
    coeff_sin = np.asarray(fb.coeff_sin).T
    coeffs = np.concatenate([coeff_cos, coeff_sin], axis=0).T  # (T, 2K)
    costs = compute_cost_traces(snapshot, cfg, ctrl, coeffs=coeffs)

    high_idx = None
    if cfg.simcase == "bump-on-tail":
        high_idx = np.asarray(make_distribution(cfg).high_indices())

    run_and_save(
        "feedback", args, cfg, ctrl, snapshot, fb.hamiltonian, fb.field_energy,
        coeff_cos=coeff_cos, coeff_sin=coeff_sin, costs=costs, high_idx=high_idx,
    )


if __name__ == "__main__":
    main()
