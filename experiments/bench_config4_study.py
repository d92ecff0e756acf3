"""BASELINE config-4 rate study (VERDICT r2 #4: the weakest scaling row).

Measures the K=4096 / H=10 / 8-control-mode / N=100k (plan 2048) solve rate
with the canonical chain slope, then sweeps the levers that could move it:
candidate tile size (PLASMA_SPECTRAL_KB), drift variant
(PLASMA_SPECTRAL_DRIFT), plan_modes, and K — each variant in a SUBPROCESS
because the kernel module reads its env knobs at import.

The r2-recorded 85.5 solves/s was single-chain wall clock (polluted by the
per-launch tunnel constant); this study establishes the true device rate
and where it sits against the headline-config throughput at equal
mode-iteration counts (K*H*N_pad*Km).

Usage: python experiments/bench_config4_study.py            # full sweep
       python experiments/bench_config4_study.py --one      # baseline only
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_CHILD = "--child" in sys.argv


def run_child(overrides: dict, env: dict) -> dict:
    e = dict(os.environ, **{k: str(v) for k, v in env.items()})
    r = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child",
         json.dumps(overrides)],
        capture_output=True, text=True, timeout=3600, env=e,
    )
    line = next((ln for ln in reversed(r.stdout.splitlines())
                 if ln.startswith("{")), None)
    if line is None:
        return {"error": (r.stdout + r.stderr)[-400:]}
    return json.loads(line)


def child_main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
    from plasma_control_tpu.control.actuator import make_actuator
    from plasma_control_tpu.models.pic import init_state
    from plasma_control_tpu.ops.grid import make_grid
    from plasma_control_tpu.utils.timing import mpc_solve_rate

    ov = json.loads(sys.argv[sys.argv.index("--child") + 1])
    cfg = SimConfig(simcase="two-stream", n_particles=100_000, n_mesh=256, dt=0.1)
    ctrl = ControlConfig(max_mode=8)
    mpc = MPCConfig(horizon=int(ov.get("H", 10)),
                    n_candidates=int(ov.get("K", 4096)),
                    plan_particles=int(ov.get("plan_particles", 2048)),
                    plan_mesh=64,
                    plan_modes=int(ov.get("Km", 16)))
    grid = jax.device_put(make_grid(cfg.n_mesh, cfg.length))
    act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
    st = init_state(cfg, jax.random.PRNGKey(0))
    res = mpc_solve_rate(st, grid, cfg, ctrl, mpc, act, r1=2, r2=22)
    print(json.dumps({
        "solves_per_s": round(res["solves_per_s"], 1),
        "compile_s": round(res["compile_s"], 1),
        "all": [round(1.0 / s, 1) for s in res["sec_per_solve_all"]],
    }))


def main() -> None:
    one = "--one" in sys.argv
    variants = [("baseline K4096.H10.Km16.n2048", {}, {})]
    if not one:
        variants += [
            ("KB=8", {}, {"PLASMA_SPECTRAL_KB": 8}),
            ("KB=32", {}, {"PLASMA_SPECTRAL_KB": 32}),
            ("trig drift", {}, {"PLASMA_SPECTRAL_DRIFT": "trig"}),
            ("Km=8 (rate only; quality ungated)", {"Km": 8}, {}),
            ("K=2048 (rate only; quality ungated)", {"K": 2048}, {}),
            ("plan_particles=4096", {"plan_particles": 4096}, {}),
        ]
    out = {}
    for name, ov, env in variants:
        r = run_child(ov, env)
        out[name] = r
        print(f"{name:42s} {r}", flush=True)
    print("# summary:", json.dumps(out))


if __name__ == "__main__":
    if _CHILD:
        child_main()
    else:
        main()
