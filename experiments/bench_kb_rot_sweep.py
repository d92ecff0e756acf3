"""Candidate-tile (KB) sweep with the rot drift at the headline bench
shapes (K=384, N=5000 -> N_pad=5120, H=6, Km=8). Result (TPU v5e,
2026-08-21): KB=32 3010 solves/s vs KB=16 2665 vs KB=8 2529; KB=48 exceeds
the VMEM scratch budget. Basis for the drift-aware _kb_default
(ops/pallas/spectral_horizon.py). Each variant runs in a subprocess
because PLASMA_SPECTRAL_KB is read at kernel-module import.
"""
import os, sys, json, subprocess
CHILD = "--child" in sys.argv
if CHILD:
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
    from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
    from plasma_control_tpu.control.actuator import make_actuator
    from plasma_control_tpu.models.pic import init_state
    from plasma_control_tpu.ops.grid import make_grid
    from plasma_control_tpu.utils.timing import mpc_solve_rate
    cfg = SimConfig(simcase="bump-on-tail", n_particles=5000, n_mesh=250, dt=0.1)
    ctrl = ControlConfig(max_mode=4)
    mpc = MPCConfig(horizon=6, w_terminal=4.0, n_candidates=384, plan_modes=8,
                    spectral_drift="rot")
    grid = make_grid(cfg.n_mesh, cfg.length)
    act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
    st = init_state(cfg, jax.random.PRNGKey(0))
    res = mpc_solve_rate(st, grid, cfg, ctrl, mpc, act)
    print(json.dumps({"solves_per_s": round(res["solves_per_s"],1),
                      "all": [round(1/s,1) for s in res["sec_per_solve_all"]]}))
else:
    for kb in ("16", "32", "48", "8"):
        env = dict(os.environ, PLASMA_SPECTRAL_KB=kb)
        r = subprocess.run([sys.executable, __file__, "--child"],
                           capture_output=True, text=True, timeout=2400, env=env)
        line = next((l for l in reversed(r.stdout.splitlines()) if l.startswith("{")), r.stderr[-200:])
        print(f"KB={kb:3s} rot  {line}", flush=True)
