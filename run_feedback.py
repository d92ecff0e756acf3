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
    p.add_argument("--checkpoint_every", type=int, default=0, help="steps between full-state checkpoints (0 = off)")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--no_resume", action="store_true", help="ignore an existing checkpoint")
    args = vars(p.parse_args())
    cfg = build_sim_config(args)
    ctrl = build_control_config(args)

    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    actuator = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode, endpoint_grid=ctrl.endpoint_grid)
    state = init_state(cfg, jax.random.PRNGKey(cfg.seed))

    if args["checkpoint_every"]:
        from plasma_control_tpu.io.resume import resumable_feedback_rollout

        ck = args["checkpoint_path"] or f"checkpoints/{args['simcase']}-feedback"
        _, tr = resumable_feedback_rollout(
            state, grid, cfg, ctrl, actuator,
            ckpt_path=ck,
            segment_steps=args["checkpoint_every"],
            resume=not args["no_resume"],
        )
        xs, vs = tr["xs"], tr["vs"]
        pe, ke = tr["field_energy"], tr["kinetic"]
        hamiltonian = pe + ke
        coeff_cos_t, coeff_sin_t = tr["coeff_cos"], tr["coeff_sin"]
    else:
        fb = feedback_rollout(state, grid, cfg, ctrl, actuator, record_snapshots=True)
        xs, vs = np.asarray(fb.xs), np.asarray(fb.vs)
        pe, hamiltonian = fb.field_energy, fb.hamiltonian
        coeff_cos_t, coeff_sin_t = np.asarray(fb.coeff_cos), np.asarray(fb.coeff_sin)

    snapshot = np.concatenate([xs.T, vs.T], axis=0)
    coeff_cos = coeff_cos_t.T  # (K, T) like the reference stacking
    coeff_sin = coeff_sin_t.T
    coeffs = np.concatenate([coeff_cos, coeff_sin], axis=0).T  # (T, 2K)
    costs = compute_cost_traces(snapshot, cfg, ctrl, coeffs=coeffs)

    high_idx = None
    if cfg.simcase == "bump-on-tail":
        high_idx = np.asarray(make_distribution(cfg).high_indices())

    run_and_save(
        "feedback", args, cfg, ctrl, snapshot, hamiltonian, pe,
        coeff_cos=coeff_cos, coeff_sin=coeff_sin, costs=costs, high_idx=high_idx,
    )


if __name__ == "__main__":
    main()
