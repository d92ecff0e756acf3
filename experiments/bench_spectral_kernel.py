"""Rate comparison: XLA spectral planner vs the fused whole-horizon Pallas
spectral kernel (ops/pallas/spectral_horizon.py), slope method (DEVNOTES
measurement methodology), at the bench headline shapes and the old
reduced-fidelity shapes.

Run: python /root/repo/experiments/bench_spectral_kernel.py
Measured results are recorded below / in DEVNOTES after each run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if __name__ == "__main__":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
    from plasma_control_tpu.control.actuator import make_actuator
    from plasma_control_tpu.models.pic import init_state
    from plasma_control_tpu.ops.grid import make_grid
    from plasma_control_tpu.utils.timing import mpc_solve_rate

    cfg = SimConfig(simcase="bump-on-tail", n_particles=5000, n_mesh=250,
                    dt=0.1, t_max=50.0, length=50.0)
    ctrl = ControlConfig(max_mode=4)
    grid = make_grid(cfg.n_mesh, cfg.length)
    act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
    state = init_state(cfg, jax.random.PRNGKey(0))

    def rate(mpc):
        return mpc_solve_rate(state, grid, cfg, ctrl, mpc, act)["solves_per_s"]

    variants = [
        ("bench H8.Km8.fullN xla  ", MPCConfig(horizon=8, n_candidates=512, plan_modes=8, plan_kernel="xla")),
        ("bench H8.Km8.fullN fused", MPCConfig(horizon=8, n_candidates=512, plan_modes=8, plan_kernel="fused")),
        ("H10.Km16.fullN xla      ", MPCConfig(horizon=10, n_candidates=512, plan_modes=16, plan_kernel="xla")),
        ("H10.Km16.fullN fused    ", MPCConfig(horizon=10, n_candidates=512, plan_modes=16, plan_kernel="fused")),
    ]
    for label, mpc in variants:
        print(label, round(rate(mpc), 1), "solves/s", flush=True)

# Result (TPU v5e, 2026-08-19, slope method):
#   bench H8.Km8.fullN  xla 532.5  fused 860.9  (1.62x)
#   H10.Km16.fullN      xla 314.3  fused 404.4  (1.29x)
# bench.py full run with auto->fused: 841.5 solves/s headline (1.2 ms/solve),
# reduced-fidelity secondary 1506.9, vs_baseline 1349x (best-of-5 C++ trials).
# Tile sweep (PLASMA_SPECTRAL_KB, same shapes, 2026-08-19): KB=8: 805.9,
# KB=16: 825.9 (default), KB=32: 768.5 solves/s.
