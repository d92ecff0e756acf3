"""One-off TPU experiment: MPC solve throughput by planner variant at the
headline bench shapes (K=512, H=10, plan 1024/64, bump-on-tail N=5000/250).

Measures with the scan-chain *slope* method (utils/timing.slope_time) — the
only per-op timing DEVNOTES trusts over the axon tunnel — with per-iteration
varying keys so no relay cache can serve results.

Run: python /root/repo/experiments/bench_kdk.py [integ/kern ...]

NOTE (round 4): the grid-planner Pallas kernels this script measured were
demoted to experiments/pallas_fused_step.py (VERDICT r3 #6 — measured
2-3x slower than XLA); requesting them via MPCConfig now raises. The
recorded numbers stand in DEVNOTES; to re-measure, dispatch the kernels
directly as experiments/test_pallas_fused_step.py does.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp

from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
from plasma_control_tpu.control.actuator import make_actuator
from plasma_control_tpu.control.mpc import plan
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.ops.grid import make_grid
from plasma_control_tpu.utils.timing import slope_time

CFG = SimConfig(simcase="bump-on-tail", n_particles=5000, n_mesh=250,
                dt=0.1, t_max=50.0, length=50.0)
CTRL = ControlConfig(max_mode=4)
GRID = make_grid(CFG.n_mesh, CFG.length)
ACT = make_actuator(CFG.length, CFG.n_mesh, CTRL.max_mode)
STATE = init_state(CFG, jax.random.PRNGKey(0))


def solve_rate(plan_integrator: str, plan_kernel: str) -> float:
    mpc = MPCConfig(horizon=10, n_candidates=512, plan_particles=1024,
                    plan_mesh=64, plan_integrator=plan_integrator,
                    plan_kernel=plan_kernel)
    sigma = jnp.asarray(mpc.sigma0, dtype=jnp.float32)

    def step(carry):
        mean, key, acc = carry
        k1, key = jax.random.split(key)
        _, new_mean, best = plan(STATE, mean, sigma, k1, GRID, CFG, CTRL, mpc, ACT)
        return (new_mean, key, acc + best)

    carry0 = (
        jnp.zeros((mpc.horizon, CTRL.n_actions), dtype=jnp.float32),
        jax.random.PRNGKey(hash((plan_integrator, plan_kernel)) % (2**31)),
        jnp.asarray(0.0, jnp.float32),
    )
    sec = slope_time(step, carry0, r1=2, r2=22)
    rate = 1.0 / sec if sec > 0 else float("inf")
    print(json.dumps({
        "planner": f"{plan_integrator}/{plan_kernel}",
        "solves_per_s": round(rate, 2),
        "ms_per_solve": round(1e3 * sec, 3),
    }), flush=True)
    return rate


if __name__ == "__main__":
    modes = sys.argv[1:] or ["leapfrog/xla", "leapfrog/auto", "kdk/xla", "kdk/auto"]
    for m in modes:
        integ, kern = m.split("/")
        solve_rate(integ, kern)
