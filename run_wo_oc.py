"""Uncontrolled Vlasov–Poisson PIC rollout.

Entry-point parity with `/root/reference/run_wo_oc.py` (same flags, same
data.mat schema, same plot set) — but the Nt-step loop is one compiled
``lax.scan`` on the accelerator.

Usage: python run_wo_oc.py --simcase two-stream --num_particle 5000 --is_save
"""

import jax
import numpy as np

from plasma_control_tpu.cli import base_parser, build_control_config, build_sim_config, compute_cost_traces, run_and_save
from plasma_control_tpu.models.distributions import make_distribution
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.models.rollout import rollout, snapshot_from_rollout
from plasma_control_tpu.ops.grid import make_grid


def main():
    p = base_parser("Vlasov-Poisson plasma kinetic simulation without E-field control")
    p.add_argument("--checkpoint_every", type=int, default=0, help="steps between full-state checkpoints (0 = off)")
    p.add_argument("--checkpoint_path", type=str, default=None)
    p.add_argument("--no_resume", action="store_true", help="ignore an existing checkpoint")
    args = vars(p.parse_args())
    cfg = build_sim_config(args)
    ctrl = build_control_config(args)

    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    state = init_state(cfg, jax.random.PRNGKey(cfg.seed))

    if args["checkpoint_every"]:
        from plasma_control_tpu.io.resume import resumable_rollout

        ck = args["checkpoint_path"] or f"checkpoints/{args['simcase']}-wo-oc"
        final, pe, ke, xs, vs = resumable_rollout(
            state, grid, cfg,
            ckpt_path=ck,
            segment_steps=args["checkpoint_every"],
            resume=not args["no_resume"],
        )
        snapshot = np.concatenate([xs.T, vs.T], axis=0)

        class _Out:
            hamiltonian = pe + ke
            field_energy = pe

        out = _Out()
    else:
        out = rollout(state, grid, cfg, record_snapshots=True)
        snapshot = np.asarray(snapshot_from_rollout(out))
    costs = compute_cost_traces(snapshot, cfg, ctrl)

    high_idx = None
    if cfg.simcase == "bump-on-tail":
        high_idx = np.asarray(make_distribution(cfg).high_indices())

    run_and_save(
        "wo-oc", args, cfg, ctrl, snapshot, out.hamiltonian, out.field_energy,
        costs=costs, high_idx=high_idx,
    )


if __name__ == "__main__":
    main()
