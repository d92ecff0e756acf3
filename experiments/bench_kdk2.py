"""Relay-cache-proof slope measurement: every call (warmup and timed) uses a
distinct carry, so no (executable, inputs) pair ever repeats.

Run: python /root/repo/experiments/bench_kdk2.py [integ/kern ...]

NOTE (round 4): the grid-planner Pallas kernels this script measured were
demoted to experiments/pallas_fused_step.py (VERDICT r3 #6 — measured
2-3x slower than XLA); requesting them via MPCConfig now raises. The
recorded numbers stand in DEVNOTES; to re-measure, dispatch the kernels
directly as experiments/test_pallas_fused_step.py does.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import jax.numpy as jnp
import numpy as np

from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
from plasma_control_tpu.control.actuator import make_actuator
from plasma_control_tpu.control.mpc import plan
from plasma_control_tpu.models.pic import init_state
from plasma_control_tpu.ops.grid import make_grid

CFG = SimConfig(simcase="bump-on-tail", n_particles=5000, n_mesh=250,
                dt=0.1, t_max=50.0, length=50.0)
CTRL = ControlConfig(max_mode=4)
GRID = make_grid(CFG.n_mesh, CFG.length)
ACT = make_actuator(CFG.length, CFG.n_mesh, CTRL.max_mode)
STATE = init_state(CFG, jax.random.PRNGKey(0))


def solve_rate(plan_integrator: str, plan_kernel: str):
    mpc = MPCConfig(horizon=10, n_candidates=512, plan_particles=1024,
                    plan_mesh=64, plan_integrator=plan_integrator,
                    plan_kernel=plan_kernel)
    sigma = jnp.asarray(mpc.sigma0, dtype=jnp.float32)

    def step(carry):
        mean, key, acc = carry
        k1, key = jax.random.split(key)
        _, new_mean, best = plan(STATE, mean, sigma, k1, GRID, CFG, CTRL, mpc, ACT)
        return (new_mean, key, acc + best)

    def chained(r):
        @jax.jit
        def run(c):
            c, _ = jax.lax.scan(lambda c, _: (step(c), ()), c, None, length=r)
            return c
        return run

    seed = [hash((plan_integrator, plan_kernel)) % (2**31)]

    def carry():
        seed[0] += 1
        return (jnp.zeros((mpc.horizon, CTRL.n_actions), dtype=jnp.float32),
                jax.random.PRNGKey(seed[0]), jnp.asarray(0.0, jnp.float32))

    r1, r2 = 2, 22
    f1, f2 = chained(r1), chained(r2)
    np.asarray(f1(carry())[2])  # compile + warm
    np.asarray(f2(carry())[2])

    slopes = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(f1(carry())[2])
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(f2(carry())[2])
        tb = time.perf_counter() - t0
        slopes.append((tb - ta) / (r2 - r1))
    sec = float(np.median(slopes))
    print(json.dumps({
        "planner": f"{plan_integrator}/{plan_kernel}",
        "solves_per_s": round(1.0 / sec, 2) if sec > 0 else None,
        "ms_per_solve_median": round(1e3 * sec, 3),
        "ms_all": [round(1e3 * s, 3) for s in slopes],
    }), flush=True)


if __name__ == "__main__":
    modes = sys.argv[1:] or ["leapfrog/xla", "kdk/xla", "kdk/auto"]
    for m in modes:
        integ, kern = m.split("/")
        solve_rate(integ, kern)
