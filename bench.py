"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline: full-horizon MPC solves/s on one chip (BASELINE.json config 3:
bump-on-tail, 4 Fourier control modes, reference default workload N=5000
particles / 250 cells). The solve is the framework's QUALITY-VALIDATED
default for this case: gridless spectral candidate dynamics at FULL
particle fidelity, plan_modes=8, horizon 6 with a terminal tail cost
(w_terminal=4: the solve charges 4 more steps of the final planning-model
field energy — a value-function tail estimate that lets H=6 rank candidates
like H=10), K=384 knot-sampled antithetic candidates.
Quality gates (closed-loop, bench scale, seed-paired —
experiments/bench_growth_study.py + bench_k_study.py +
bench_fidelity_study.py, DEVNOTES 2026-08-20): H6.w4 == H8 at 8 paired
seeds on both cases (bump-on-tail 13.2 vs 12.8, two-stream 27.5 vs 31.0);
K=384 == K=512 at 16 paired two-stream seeds (mean 29.4 vs 29.9, median
23.8 vs 24.2) and bump-on-tail is flat in K down to 128 — while K=256
FAILS the two-stream gate (+18% mean, fat tail) and is not taken. Net
planning-work cut vs the r1 H8/K512 headline: (8/6)*(512/384) = 1.78x at
seed-paired-equal suppression. Shorter horizons fail the two-stream gate
(H5: 36.0, H4: 44.7), and the per-candidate growth tail estimator that
wins at small K is noise-dominated at bench K/Km
(experiments/growth_terminal_study.py has the small-K story). Earlier
rounds benched a particle-subsampled planning model (plan 1024 of 5000,
~2x faster, "1021 solves/s") — measurably harmful on this workload (the
planner cancels subsample noise that doesn't exist in the real plasma and
pumps tail PE to ~270); that configuration remains valid only for
strong-signal regimes and is reported as
``mpc_solves_per_s_reduced_fidelity`` in BENCH_DETAILS.json, not as the
headline.

``vs_baseline`` compares against a compiled CPU implementation of the same
K x H solve with the reference's exact kernel semantics (native/pic_ref.cpp:
Thomas + Sherman-Morrison Poisson solve, CIC, Yoshida-4) at the same
(full-fidelity) shapes, measured in-process — the reference itself publishes
no numbers (BASELINE.md) and its hot kernels are Numba/LLVM-compiled, so
-O3 C++ is the honest single-core apples-to-apples baseline (a NumPy
fallback is used if no toolchain is available).

Details (push-throughput sub-benchmark, timings) go to BENCH_DETAILS.json.
"""

from __future__ import annotations

import json
import math
import os
import time

import numpy as np

# Persistent XLA compilation cache location, derived from this file's own
# directory (ADVICE r4: a hardcoded /root/repo/.jax_cache makes every compile
# mislabeled "warm" when the repo is checked out elsewhere).
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _json_safe(obj):
    """NaN/Inf -> None, recursively: ``json.dumps`` would emit the bare
    token ``NaN`` (invalid per RFC 8259, rejected by strict parsers/jq) —
    e.g. when a fully stalled tunnel session makes every slope trial
    non-positive and the rate is NaN by design (utils/timing.py)."""
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, float) and not math.isfinite(obj):
        return None
    return obj


def _numpy_reference_step_rate(n_particles: int, n_mesh: int, length: float, dt: float, reps: int = 30) -> float:
    """Steps/s of a reference-style NumPy PIC step (same math, CPU)."""
    rng = np.random.default_rng(0)
    x = rng.uniform(0, length, n_particles)
    v = rng.standard_normal(n_particles)
    dx = length / n_mesh

    # precomputed circulant E operator (same as the TPU one, built once)
    k = np.arange(n_mesh)
    lam = (2 * np.cos(2 * np.pi * k / n_mesh) - 2) / dx**2
    g = 1j * np.sin(2 * np.pi * k / n_mesh) / dx
    inv = np.zeros(n_mesh, dtype=complex)
    inv[1:] = 1.0 / lam[1:]
    eig = -g * inv
    col = np.fft.ifft(eig).real
    e_op = col[(k[:, None] - k[None, :]) % n_mesh]

    def accel(xp):
        xm = np.mod(xp, length)
        il = np.floor(xm / dx).astype(int)
        frac = xm / dx - il
        il %= n_mesh
        ir = (il + 1) % n_mesh
        n = np.bincount(il, weights=1.0 - frac, minlength=n_mesh)
        n += np.bincount(ir, weights=frac, minlength=n_mesh)
        n *= length / n_particles / dx
        e_mesh = e_op @ (n - 1.0)
        return -((1.0 - frac) * e_mesh[il] + frac * e_mesh[ir])

    phi = 2 ** (1 / 3)
    w0, w1 = -phi / (2 - phi), 1 / (2 - phi)
    cs = [0.5 * w1, 0.5 * (w0 + w1), 0.5 * (w0 + w1), 0.5 * w1]
    ds = [w1, w0, w1]

    def step(x, v):
        x = x + cs[0] * dt * v
        for c, d in zip(cs[1:], ds):
            v = v + d * dt * accel(x)
            x = x + c * dt * v
        return np.mod(x, length), v

    step(x, v)  # warm caches
    t0 = time.perf_counter()
    for _ in range(reps):
        x, v = step(x, v)
    return reps / (time.perf_counter() - t0)


def _native_reference_step_rate(n_particles, n_mesh, length, dt, reps=100, trials=5):
    """Steps/s of the compiled C++ reference-semantics step, or None.

    Takes the BEST of several trials: the host is shared and a loaded trial
    under-measures the baseline, which would inflate vs_baseline (observed
    4x swings). The max is the fairest number for the CPU and the
    conservative one for the reported ratio."""
    from plasma_control_tpu.utils.native import native_step, load_library

    if load_library() is None:
        return None
    rng = np.random.default_rng(0)
    x = rng.uniform(0, length, n_particles)
    v = rng.standard_normal(n_particles)
    native_step(x, v, n_mesh, length, dt)  # warm
    best = 0.0
    for _ in range(trials):
        xt, vt = x.copy(), v.copy()
        t0 = time.perf_counter()
        for _ in range(reps):
            xt, vt, _ = native_step(xt, vt, n_mesh, length, dt)
        best = max(best, reps / (time.perf_counter() - t0))
    return best


def main():
    import jax

    # Persistent compilation cache: the MPC solve-chain XLA program is large
    # and remote compile latency is highly variable (40-370s observed);
    # caching makes repeat bench runs start in seconds.
    jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

    from plasma_control_tpu.config import ControlConfig, MPCConfig, SimConfig
    from plasma_control_tpu.control.actuator import make_actuator
    from plasma_control_tpu.models.pic import init_state
    from plasma_control_tpu.models.rollout import rollout
    from plasma_control_tpu.ops.grid import make_grid

    details = {"device": str(jax.devices()[0])}

    # ---------------- headline: MPC solves/s (1 chip) ----------------
    cfg = SimConfig(
        simcase="bump-on-tail", n_particles=5000, n_mesh=250, dt=0.1, t_max=50.0, length=50.0
    )
    ctrl = ControlConfig(max_mode=4)
    # Full-fidelity planning (candidate rollouts over all N particles):
    # particle subsampling is measurably harmful on this quiet workload (see
    # module docstring / DEVNOTES). H=6 + w_terminal=4, K=384 and plan_modes=8
    # are quality-equal to H=8/K=512/Km=8 and H=10/Km=16 (seed-paired gates:
    # experiments/bench_growth_study.py + bench_k_study.py). The CPU baseline
    # below is measured at the SAME full shapes so vs_baseline compares equal
    # work.
    # spectral_drift="rot" (explicit; == the "auto" package default at these
    # shapes): the phasor-rotation drift is quality-gated seed-paired EQUAL
    # to trig on all three simcases at bench scale — 112 paired closed-loop
    # rollouts, experiments/rot_drift_gate.py (this case: tails 13.7 vs
    # 13.3, IE equal, 8 paired seeds). The opt-out trig rate is recorded as
    # mpc_solves_per_s_trig below.
    mpc = MPCConfig(horizon=6, w_terminal=4.0, n_candidates=384, plan_modes=8,
                    spectral_drift="rot")
    grid = make_grid(cfg.n_mesh, cfg.length)
    act = make_actuator(cfg.length, cfg.n_mesh, ctrl.max_mode)
    state = init_state(cfg, jax.random.PRNGKey(0))

    # Sustained throughput: the canonical two-length warm-started solve-chain
    # slope (utils/timing.py::mpc_solve_rate) — the constant per-launch
    # tunnel/dispatch latency of the remote attachment (~0.3 s here,
    # amortized to zero in a production receding-horizon run of hundreds of
    # solves) cancels in the chain-length subtraction; fresh keys per call
    # defeat any relay cache (DEVNOTES: measurement methodology).
    from plasma_control_tpu.utils.timing import mpc_solve_rate

    # Warm- vs cold-cache compile split (VERDICT r3 weak #5): the same-round
    # swing 24.9 s vs 149.1 s was two different cache states reported under
    # one name. Count persistent-cache entries around the compile — if none
    # were added, the XLA compile was served from .jax_cache (warm) and the
    # seconds measure trace+load only; if entries appeared, it was a cold
    # compile. Both states are recorded explicitly.
    import glob as _glob

    def _cache_entries():
        return len(_glob.glob(os.path.join(_CACHE_DIR, "*")))

    cache_before = _cache_entries()
    res = mpc_solve_rate(state, grid, cfg, ctrl, mpc, act)
    # entries-added count rather than a binary: a partial hit (one of the
    # two chain programs cached, the other compiled) is its own state —
    # a bare "cold" label on a mostly-warm number would recreate the
    # conflation this field exists to fix (review finding r4)
    cache_added = _cache_entries() - cache_before
    cache_state = "warm" if cache_added == 0 else "cold_or_partial"
    solves_per_s = res["solves_per_s"]
    details["mpc_compile_s"] = res["compile_s"]
    details["mpc_compile_cache_state"] = cache_state
    details["mpc_compile_cache_entries_added"] = cache_added
    details[f"mpc_compile_s_{cache_state}_cache"] = res["compile_s"]
    details["mpc_solves_per_s"] = solves_per_s
    details["mpc_ms_per_solve_all"] = [round(1e3 * s, 3) for s in res["sec_per_solve_all"]]
    details["mpc_wall_chain52_s"] = round(res["wall_chain_s"], 3)

    # ---------------- achieved utilization vs v5e peaks (VERDICT r4 #7) ----
    # Put a number behind "speed-of-light": the headline solve is ONE fused
    # Pallas kernel (ops/pallas/spectral_horizon.py) whose work and traffic
    # are closed-form in the shapes, so achieved FLOP/s and HBM GB/s follow
    # from the measured solve rate. All arithmetic is VPU elementwise fp32 —
    # the MXU is idle by design (mode-recurrence MACs have no matmul shape;
    # an MXU matvec for the lane reductions measured 2x slower, see the
    # kernel). FLOP model per candidate-particle (counting 1 per add/mul):
    #   per mode per step: Chebyshev recurrence 4 + mode-sum adds 2 +
    #     field-projection MACs 4                                  = 10
    #   per step fixed: phasor-rotation drift ~21 + merged kick 2  = 23
    #   initial half-kick: ~8 per mode
    # HBM traffic: x0/v0/mask reloaded per candidate tile (grid sweep),
    # coefficients (K, 2Km + 2HKm) in, (K, H) energies out — O(K*N) total,
    # NOT O(K*N*H): the particle state lives in VMEM for the whole horizon.
    # Peaks (v5e, public specs): HBM 819 GB/s; VPU fp32 = 1024 ALUs
    # (8 sublanes x 128 lanes) x 4 SIMD units x 2 (FMA) x 0.94 GHz clock
    # = 7.7 TFLOP/s (clock from the 197 bf16 TFLOP/s MXU spec's derivation;
    # the VPU figure is a model, stated here so the ratio is auditable).
    from plasma_control_tpu.ops.pallas.spectral_horizon import (
        _kb_clamped, _round_up)

    n_pad = _round_up(cfg.n_particles, 128)
    km, h, k_cand = mpc.plan_modes, mpc.horizon, mpc.n_candidates
    flops_solve = k_cand * n_pad * (h * (23.0 + 10.0 * km) + 8.0 * km)
    kb = _kb_clamped(n_pad, rot=True)
    hbm_bytes = 4.0 * (
        (k_cand / kb) * 3 * n_pad  # x0/v0/mask per tile
        + k_cand * (2 * km + 2 * h * km)  # u0 + boundary-pair coefficients
        + k_cand * h  # PE out
    )
    vpu_peak = 8 * 128 * 4 * 2 * 0.94e9
    hbm_peak = 8.19e11
    if math.isfinite(solves_per_s) and solves_per_s > 0:
        details["utilization"] = {
            "flops_model_per_solve": flops_solve,
            "hbm_bytes_model_per_solve": hbm_bytes,
            "achieved_flops_per_s": round(flops_solve * solves_per_s, -9),
            "achieved_hbm_bytes_per_s": round(hbm_bytes * solves_per_s, -6),
            "vpu_peak_flops_per_s_model": vpu_peak,
            "hbm_peak_bytes_per_s": hbm_peak,
            "achieved_flops_util": round(flops_solve * solves_per_s / vpu_peak, 3),
            "achieved_bandwidth_util": round(hbm_bytes * solves_per_s / hbm_peak, 5),
            "note": "fused spectral kernel at the headline shapes (rot drift, "
                    f"KB={kb}, N_pad={n_pad}): compute-bound by construction — "
                    "HBM utilization is negligible because the horizon runs "
                    "entirely in VMEM; the FLOP count is the analytic kernel "
                    "model, so 'util' is achieved-model-FLOPs vs the VPU peak "
                    "model above",
        }

    # Real-time margin of the serving story (VERDICT r3 stretch #9): each
    # solve advances one control period dt = 0.1 (simulation units, where
    # w_pe = sqrt(n0) = 1 and the plasma period is 2*pi). The controller
    # therefore advances solves/s * dt / (2*pi) plasma periods per
    # wall-clock second, and runs in real time for any plasma with
    # w_pe <= solves/s * dt rad/s.
    details["real_time_factor"] = {
        "plasma_periods_per_wall_s": round(solves_per_s * cfg.dt / (2 * np.pi), 2),
        "max_real_time_w_pe_rad_per_s": round(solves_per_s * cfg.dt, 1),
        "note": "periods of plasma evolution the closed loop sustains per "
                "wall-clock second at one solve per dt=0.1/w_pe control period",
    }

    # Secondary: the opt-out trig drift at the same shapes (the pre-gate
    # baseline kernel; also the automatic fallback for pathological dt*L).
    mpc_trig = MPCConfig(horizon=6, w_terminal=4.0, n_candidates=384,
                         plan_modes=8, spectral_drift="trig")
    details["mpc_solves_per_s_trig"] = mpc_solve_rate(
        state, grid, cfg, ctrl, mpc_trig, act
    )["solves_per_s"]

    # Secondary: the particle-subsampled planning configuration (plan 1024 of
    # 5000, Km=16, H=10) — valid ONLY for strong-signal regimes (e.g. a
    # growing two-stream); measurably harmful on this quiet bump-on-tail
    # workload (module docstring). Recorded for the scaling story, not the
    # headline.
    mpc_rf = MPCConfig(horizon=10, n_candidates=512, plan_particles=1024, plan_mesh=64)
    details["mpc_solves_per_s_reduced_fidelity"] = mpc_solve_rate(
        state, grid, cfg, ctrl, mpc_rf, act
    )["solves_per_s"]

    # ---------------- AOT cold start (deployment/serving path) ------------
    # A fresh process must reach its first solve through a persisted artifact
    # (io/aot.py; VERDICT r2 missing #2) rather than re-tracing + re-compiling
    # the framework. Only the StableHLO artifact (pure serialized IR, safe to
    # commit) is kept in git; the pickled-executable artifact is ALWAYS
    # rebuilt locally this run (ADVICE r3 medium: auto-unpickling a committed
    # blob both executes untrusted code and can silently measure a stale
    # program after a non-shape config change). The committed StableHLO
    # carries a config fingerprint sidecar and is rebuilt on mismatch for the
    # same staleness reason. The measurement runs in a subprocess so it pays
    # the full cold path (interpreter + jax import + backend attach + load +
    # first solve).
    import dataclasses
    import hashlib
    import subprocess
    import sys

    aot_dir = os.path.join("artifacts", "aot")
    os.makedirs(aot_dir, exist_ok=True)
    hlo_path = os.path.join(aot_dir, "ctrl_step_bench.stablehlo")
    meta_path = os.path.join(aot_dir, "ctrl_step_bench.meta.json")
    exec_path = os.path.join(aot_dir, "ctrl_step_bench.exec.pkl")  # gitignored
    fingerprint = hashlib.sha256(
        json.dumps(
            {
                "cfg": dataclasses.asdict(cfg),
                "ctrl": dataclasses.asdict(ctrl),
                "mpc": dataclasses.asdict(mpc),
                "jax": jax.__version__,
            },
            sort_keys=True,
            default=str,
        ).encode()
    ).hexdigest()
    try:
        from plasma_control_tpu.io.aot import export_plan, save_compiled_plan

        stale = True
        if os.path.exists(hlo_path) and os.path.exists(meta_path):
            with open(meta_path) as f:
                stale = json.load(f).get("config_sha256") != fingerprint
        if stale:
            t0 = time.perf_counter()
            export_plan(grid, cfg, ctrl, mpc, act, path=hlo_path, kind="control_step")
            details["aot_export_build_s"] = round(time.perf_counter() - t0, 1)
            with open(meta_path, "w") as f:
                json.dump({"config_sha256": fingerprint, "kind": "control_step"}, f)
        # the executable pickle is never trusted from disk: rebuild every run
        t0 = time.perf_counter()
        save_compiled_plan(exec_path, grid, cfg, ctrl, mpc, act, kind="control_step")
        details["aot_exec_build_s"] = round(time.perf_counter() - t0, 1)
        for label, path in (("exec", exec_path), ("stablehlo", hlo_path)):
            # best of 2 attempts: the tunnel's device-attach latency
            # occasionally stalls for minutes (observed: a 140 s first_solve
            # next to 1.1-1.4 s ones) — the artifact's capability is the
            # unstalled number; all attempts are recorded.
            attempts = []
            for _ in range(2):
                r = subprocess.run(
                    [sys.executable, os.path.join("experiments", "aot_cold_start.py"),
                     path, str(cfg.n_particles), str(mpc.horizon), str(ctrl.n_actions)],
                    capture_output=True, text=True, timeout=1800,
                )
                line = (r.stdout.strip().splitlines() or [""])[-1]
                if r.returncode == 0 and line.startswith("{"):
                    attempts.append(json.loads(line))
                else:
                    attempts.append({"error": (r.stdout + r.stderr)[-300:]})
            ok = [a for a in attempts if "error" not in a]
            if ok:
                best = min(ok, key=lambda a: a["total_s"])
                best["attempt_totals_s"] = [a.get("total_s") for a in attempts]
                details[f"cold_start_with_artifact_{label}"] = best
            else:
                # stale topology/compiler: rebuild once and retry next round
                details[f"cold_start_with_artifact_{label}"] = attempts[-1]
                if os.path.exists(path):
                    os.remove(path)
    except Exception as e:  # the headline must never die on the AOT extra
        details["cold_start_with_artifact_error"] = f"{type(e).__name__}: {e}"[:300]

    # ---------------- sub-benchmark: particle-push steps/s ----------------
    cfg1 = SimConfig(simcase="two-stream", n_particles=10000, n_mesh=64, dt=0.1, t_max=50.0)
    grid1 = make_grid(cfg1.n_mesh, cfg1.length)
    st1 = init_state(cfg1, jax.random.PRNGKey(0))
    roll = jax.jit(lambda s: rollout(s, grid1, cfg1, n_steps=500).final_state)
    t0 = time.perf_counter()
    jax.block_until_ready(roll(st1))
    details["rollout_compile_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(3):
        out1 = roll(st1)
    jax.block_until_ready(out1)
    details["push_steps_per_s"] = 3 * 500 / (time.perf_counter() - t0)

    # ---------------- CPU baseline (reference-style NumPy) ----------------
    plan_n = mpc.plan_particles or cfg.n_particles
    plan_m = mpc.plan_mesh or cfg.n_mesh
    np_rate = _native_reference_step_rate(plan_n, plan_m, cfg.length, cfg.dt)
    if np_rate is None:
        details["cpu_baseline"] = "numpy"
        np_rate = _numpy_reference_step_rate(plan_n, plan_m, cfg.length, cfg.dt, reps=100)
    else:
        details["cpu_baseline"] = "native-cpp"
    details["numpy_step_rate"] = np_rate
    # one full solve = n_candidates * horizon PIC steps
    np_solves_per_s = np_rate / (mpc.n_candidates * mpc.horizon)
    details["numpy_solves_per_s"] = np_solves_per_s

    vs_baseline = solves_per_s / np_solves_per_s

    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(_json_safe(details), f, indent=2)

    print(
        json.dumps(
            _json_safe(
                {
                    "metric": "mpc_solves_per_s",
                    "value": round(solves_per_s, 3),
                    "unit": "solves/s",
                    "vs_baseline": round(vs_baseline, 2),
                }
            )
        )
    )


if __name__ == "__main__":
    main()
