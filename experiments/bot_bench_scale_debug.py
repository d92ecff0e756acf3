"""Debug: bump-on-tail control quality at the BASELINE config-3 scale
(N=5000/M=250, max_mode=4). The bench_fidelity_study found the default MPC
*raises* tail PE ~8x over uncontrolled there, while two-stream is suppressed
5.7x. This script prints windowed PE means over the run for uncontrolled /
feedback / MPC variants to see WHEN the divergence happens, plus input-energy
traces, for a few seeds.

Run: python experiments/bot_bench_scale_debug.py [n_seeds]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    import numpy as np
    import jax.numpy as jnp

    from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
    from plasma_control_tpu.control.actuator import make_actuator
    from plasma_control_tpu.control.feedback import feedback_rollout
    from plasma_control_tpu.control.mpc import mpc_rollout
    from plasma_control_tpu.models.pic import init_state
    from plasma_control_tpu.models.rollout import rollout
    from plasma_control_tpu.ops.grid import make_grid

    n_seeds = int(sys.argv[1]) if len(sys.argv) > 1 else 2

    cfg = SimConfig(simcase="bump-on-tail", n_particles=5000, n_mesh=250,
                    dt=0.1, t_max=50.0, length=50.0)
    ctrl = ControlConfig(max_mode=4)
    grid = make_grid(cfg.n_mesh, cfg.length)
    act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)

    def windows(pe):
        pe = np.asarray(pe)
        return [round(float(pe[i:i + 100].mean()), 1) for i in range(0, 500, 100)]

    base = dict(n_candidates=512, plan_particles=1024, plan_mesh=64)
    mpc_variants = [
        ("mpc-default", MPCConfig(**base)),
        ("mpc-w_input1", MPCConfig(**base, w_input=1.0)),
        ("mpc-grid-planner", MPCConfig(**base, plan_model="grid")),
        ("mpc-no-anti-white", MPCConfig(**base, antithetic=False, n_knots=None)),
    ]

    for s in range(n_seeds):
        st = init_state(cfg, jax.random.PRNGKey(100 + s))
        un = rollout(st, grid, cfg)
        print(f"seed {s} uncontrolled PE windows:", windows(un.field_energy), flush=True)
        fb = feedback_rollout(st, grid, cfg, ctrl, act)
        print(f"seed {s} feedback     PE windows:", windows(fb.field_energy), flush=True)
        for label, mpc in mpc_variants:
            out = mpc_rollout(st, grid, cfg, ctrl, mpc, act, jax.random.PRNGKey(s))
            ie = np.asarray(out.input_energy)
            print(
                f"seed {s} {label:18s} PE windows:", windows(out.field_energy),
                "IE mean", round(float(ie.mean()), 3), flush=True,
            )

# Follow-up variants (see run log in DEVNOTES): full-fidelity planning.
# The first round showed ALL plan_particles=1024 variants pump the
# bump-on-tail plasma (IE ~13, PE 3-10x uncontrolled) while the small
# config (full-fidelity planning) suppresses — hypothesis: the subsampled
# planning model's shot-noise field (~5x the env's) is cancellable
# in-model, so the planner buys fake PE reductions with real drive.
