"""Compare MPC planner variants on the real TPU (slope method, bench shapes).

Usage: python experiments/bench_planners.py [variant ...]
Variants: leapfrog, kdk, kdk-fused, leapfrog-fused, packed (when available).

NOTE (round 4): the grid-planner Pallas kernels this script measured were
demoted to experiments/pallas_fused_step.py (VERDICT r3 #6 — measured
2-3x slower than XLA); requesting them via MPCConfig now raises. The
recorded numbers stand in DEVNOTES; to re-measure, dispatch the kernels
directly as experiments/test_pallas_fused_step.py does.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
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

    variants = sys.argv[1:] or ["leapfrog", "kdk"]
    cfg = SimConfig(
        simcase="bump-on-tail", n_particles=5000, n_mesh=250, dt=0.1, t_max=50.0, length=50.0
    )
    ctrl = ControlConfig(max_mode=4)
    grid = make_grid(cfg.n_mesh, cfg.length)
    act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
    state = init_state(cfg, jax.random.PRNGKey(0))
    mean = jnp.zeros((10, ctrl.n_actions), dtype=jnp.float32)

    r1, r2 = 2, 52
    out = {}
    for variant in variants:
        integ, _, kern = variant.partition("-")
        if variant == "packed":
            integ, kern = "kdk", "packed"
        mpc = MPCConfig(
            horizon=10, n_candidates=512, plan_particles=1024, plan_mesh=64,
            plan_integrator=integ, plan_kernel=kern or "auto",
        )
        sigma = jnp.asarray(mpc.sigma0, dtype=jnp.float32)

        def solve_chain(reps, mpc=mpc, sigma=sigma):
            @jax.jit
            def run(st, mn, key):
                def body(carry, k):
                    mn_c, _ = carry
                    _, new_mean, best = plan(st, mn_c, sigma, k, grid, cfg, ctrl, mpc, act)
                    return (new_mean, best), best

                (_, best), bests = jax.lax.scan(
                    body, (mn, jnp.asarray(0.0, jnp.float32)), jax.random.split(key, reps))
                return bests

            return run

        f1, f2 = solve_chain(r1), solve_chain(r2)
        t0 = time.perf_counter()
        np.asarray(f1(state, mean, jax.random.PRNGKey(1)))
        np.asarray(f2(state, mean, jax.random.PRNGKey(2)))
        compile_s = time.perf_counter() - t0

        slopes = []
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(f1(state, mean, jax.random.PRNGKey(10 + 2 * i)))
            ta = time.perf_counter() - t0
            t0 = time.perf_counter()
            np.asarray(f2(state, mean, jax.random.PRNGKey(11 + 2 * i)))
            tb = time.perf_counter() - t0
            slopes.append((tb - ta) / (r2 - r1))
        sec = float(np.median(slopes))
        out[variant] = {
            "solves_per_s": round(1.0 / sec, 1),
            "ms_per_solve": [round(1e3 * s, 2) for s in slopes],
            "compile_s": round(compile_s, 1),
        }
        print(json.dumps({variant: out[variant]}), flush=True)

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
