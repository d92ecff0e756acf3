"""Segmented, resumable rollouts.

The reference cannot checkpoint a simulation mid-run (weights only, SURVEY
§5). Here a long rollout is executed in fixed-size segments with the complete
state (particles + step counter) checkpointed after each segment via Orbax,
so a preempted run resumes exactly where it stopped — the single-host form of
multi-host checkpoint-restart.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..models.pic import PlasmaState
from ..models.rollout import rollout
from ..ops.grid import Grid
from .checkpoint import load_params, restore_checkpoint, save_checkpoint, save_params

__all__ = [
    "resumable_rollout",
    "resumable_feedback_rollout",
    "resumable_mpc_rollout",
    "save_train_checkpoint",
    "restore_train_checkpoint",
]


def save_train_checkpoint(path, ts, buf, key, ep_done, hist, best_reward, best_params):
    """Persist the COMPLETE RL training state — networks *and* optimizer states
    (``ts``), replay buffer (``buf``, None for on-policy trainers), episode RNG
    key, episode counter, per-episode history, and the best actor so far.

    The reference can only save model weights (`torch.save(state_dict)`,
    `/root/reference/src/control/rl/ddpg.py:496,522-527`) — an interrupted
    training run loses the optimizer moments and the replay buffer. Layout:
    ``<path>/state`` (Orbax pytree), ``<path>/meta.npz`` (counters + history),
    ``<path>/best.msgpack`` (flax weights).

    The write is crash-consistent: the episode counter is stored both inside
    the Orbax tree (atomic rename on commit) and in ``meta.npz`` (written to a
    temp name and ``os.replace``d); restore refuses a checkpoint whose two
    counters disagree (a preemption landed between the two writes) rather
    than resuming from mismatched state.
    """
    tree = {"ts": ts, "key": key, "ep": jnp.asarray(ep_done)}
    if buf is not None:
        tree["buf"] = buf
    save_checkpoint(os.path.join(path, "state"), tree)
    save_params(os.path.join(path, "best.msgpack"), best_params)
    meta = {
        "ep_done": np.asarray(ep_done),
        "best_reward": np.asarray(np.nan if best_reward is None else best_reward),
    }
    for k, v in hist.items():
        meta[f"hist_{k}"] = np.asarray(v, dtype=np.float64)
    tmp = os.path.join(path, "meta.npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **meta)
    os.replace(tmp, os.path.join(path, "meta.npz"))


def restore_train_checkpoint(path, like_ts, like_buf, like_key, like_best):
    """Inverse of :func:`save_train_checkpoint`. Returns ``None`` when no
    checkpoint exists at ``path`` — or when the one there is unreadable or
    internally inconsistent (preempted mid-write; training restarts from
    scratch rather than resuming from mismatched state). Otherwise a dict
    with keys ``ts, buf, key, ep_done, hist, best_reward, best_params``."""
    import warnings

    meta_path = os.path.join(path, "meta.npz")
    if not os.path.exists(meta_path):
        return None
    try:
        meta = np.load(meta_path)
        ep_done = int(meta["ep_done"])
        best_reward = float(meta["best_reward"])
    except Exception as e:  # truncated meta (preempted mid-write)
        warnings.warn(f"unreadable training checkpoint meta at {meta_path} ({e}); starting fresh")
        return None
    like = {"ts": like_ts, "key": like_key, "ep": jnp.asarray(0)}
    if like_buf is not None:
        like["buf"] = like_buf
    try:
        tree = restore_checkpoint(os.path.join(path, "state"), like=like)
    except Exception:
        try:  # legacy checkpoints predate the in-tree "ep" counter
            del like["ep"]
            tree = restore_checkpoint(os.path.join(path, "state"), like=like)
            tree["ep"] = jnp.asarray(ep_done)
        except Exception as e:  # partial orbax dir, schema drift
            warnings.warn(f"unreadable training checkpoint at {path} ({e}); starting fresh")
            return None
    if int(tree["ep"]) != ep_done:
        warnings.warn(
            f"inconsistent training checkpoint at {path}: state is from episode "
            f"{int(tree['ep'])} but meta says {ep_done} (preempted mid-save); starting fresh"
        )
        return None
    hist = {
        k[len("hist_") :]: [float(x) for x in meta[k]] for k in meta.files if k.startswith("hist_")
    }
    return {
        "ts": jax.tree.map(jnp.asarray, tree["ts"]),
        "buf": jax.tree.map(jnp.asarray, tree["buf"]) if like_buf is not None else None,
        "key": jnp.asarray(tree["key"]),
        "ep_done": ep_done,
        "hist": hist,
        "best_reward": None if np.isnan(best_reward) else best_reward,
        "best_params": load_params(os.path.join(path, "best.msgpack"), like_best),
    }


def resumable_rollout(
    state: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    ckpt_path: Optional[str] = None,
    segment_steps: int = 100,
    e_external_traj: Optional[jax.Array] = None,
    resume: bool = True,
):
    """Open-loop rollout of ``cfg.n_steps`` in segments of ``segment_steps``.

    Returns (final_state, pe, ke, xs, vs) covering the steps executed by
    THIS call (a fresh run returns the full T+1 series including the initial
    sample; a resumed run returns the remaining [t_resume, T] segment — the
    earlier segments were already produced by the interrupted run).
    If ``ckpt_path`` exists and ``resume``, continues from the stored step.
    """
    total = cfg.n_steps
    like = {
        "x": np.zeros_like(np.asarray(state.x)),
        "v": np.zeros_like(np.asarray(state.v)),
        "t_done": np.asarray(0),
    }

    t_done = 0
    pe_parts, ke_parts, xs_parts, vs_parts = [], [], [], []

    if ckpt_path and resume and os.path.exists(ckpt_path):
        ck = restore_checkpoint(ckpt_path, like=like)
        t_done = int(ck["t_done"])
        if 0 < t_done <= total:
            state = PlasmaState(jnp.asarray(ck["x"]), jnp.asarray(ck["v"]))
            print(f"# resumed from {ckpt_path} at step {t_done}")

    # the initial sample belongs to a fresh run only — a resumed run's first
    # state duplicates the interrupted run's last recorded one
    first = t_done == 0
    while t_done < total:
        n = min(segment_steps, total - t_done)
        e_seg = None if e_external_traj is None else e_external_traj[t_done : t_done + n]
        out = rollout(state, grid, cfg, e_external_traj=e_seg, record_snapshots=True, n_steps=n)
        state = out.final_state
        # first segment contributes the initial sample; later ones drop it
        sl = slice(None) if first else slice(1, None)
        pe_parts.append(np.asarray(out.field_energy[sl]))
        ke_parts.append(np.asarray(out.kinetic[sl]))
        xs_parts.append(np.asarray(out.xs[sl]))
        vs_parts.append(np.asarray(out.vs[sl]))
        first = False
        t_done += n
        if ckpt_path:
            save_checkpoint(
                ckpt_path,
                {"x": np.asarray(state.x), "v": np.asarray(state.v), "t_done": np.asarray(t_done)},
            )

    pe = np.concatenate(pe_parts) if pe_parts else np.zeros(0)
    ke = np.concatenate(ke_parts) if ke_parts else np.zeros(0)
    xs = np.concatenate(xs_parts) if xs_parts else None
    vs = np.concatenate(vs_parts) if vs_parts else None
    return state, pe, ke, xs, vs


def resumable_feedback_rollout(
    state: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    ctrl,
    actuator,
    ckpt_path: Optional[str] = None,
    segment_steps: int = 100,
    resume: bool = True,
):
    """Closed-loop phase-conjugate feedback run in resumable segments.

    The feedback law is memoryless in the particle state (the coefficients
    are recomputed from the current field each step,
    `/root/reference/run_feedback.py:130-143`), so the checkpoint is just
    (x, v, t_done) and a resumed run reproduces the uninterrupted trajectory
    exactly. Returns ``(final_state, traces)`` with the per-step series
    (field_energy, kinetic, coeff_cos, coeff_sin, input_energy) and xs/vs
    snapshots covering the steps executed by THIS call (fresh runs include
    the initial sample, as in :func:`resumable_rollout`).
    """
    from ..control.feedback import feedback_rollout

    total = cfg.n_steps
    like = {
        "x": np.zeros_like(np.asarray(state.x)),
        "v": np.zeros_like(np.asarray(state.v)),
        "t_done": np.asarray(0),
    }

    t_done = 0
    if ckpt_path and resume and os.path.exists(ckpt_path):
        ck = restore_checkpoint(ckpt_path, like=like)
        t_done = int(ck["t_done"])
        if 0 < t_done <= total:
            state = PlasmaState(jnp.asarray(ck["x"]), jnp.asarray(ck["v"]))
            print(f"# resumed feedback from {ckpt_path} at step {t_done}")

    per_step = ("field_energy", "kinetic", "coeff_cos", "coeff_sin", "input_energy")
    parts = {k: [] for k in per_step}
    xs_parts, vs_parts = [], []
    first = t_done == 0
    while t_done < total:
        n = min(segment_steps, total - t_done)
        out = feedback_rollout(state, grid, cfg, ctrl, actuator, record_snapshots=True, n_steps=n)
        state = out.final_state
        for k in parts:
            parts[k].append(np.asarray(getattr(out, k)))
        sl = slice(None) if first else slice(1, None)
        xs_parts.append(np.asarray(out.xs[sl]))
        vs_parts.append(np.asarray(out.vs[sl]))
        first = False
        t_done += n
        if ckpt_path:
            save_checkpoint(
                ckpt_path,
                {"x": np.asarray(state.x), "v": np.asarray(state.v), "t_done": np.asarray(t_done)},
            )

    traces = {k: np.concatenate(v) if v else np.zeros(0) for k, v in parts.items()}
    traces["xs"] = np.concatenate(xs_parts) if xs_parts else None
    traces["vs"] = np.concatenate(vs_parts) if vs_parts else None
    return state, traces


def resumable_mpc_rollout(
    state: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    ctrl,
    mpc,
    actuator,
    key: jax.Array,
    ckpt_path: Optional[str] = None,
    segment_steps: int = 100,
    resume: bool = True,
):
    """Closed-loop MPC control of ``cfg.n_steps`` in resumable segments.

    The complete controller state — particles, the warm-started nominal
    control sequence, and the step counter — is checkpointed after each
    segment, so a preempted control run resumes mid-horizon with the exact
    same trajectory as an uninterrupted one: the per-solve key schedule is
    precomputed from ``key`` and indexed by global step, and the shifted
    nominal is restored as ``mean0``.

    Returns ``(final_state, traces)`` where ``traces`` is a dict of the
    per-step series (field_energy, kinetic, hamiltonian, coeffs,
    input_energy, plan_cost) covering the steps executed by THIS call, plus
    ``coeffs_full`` — the cumulative (T, 2K) applied-coefficient history
    across interruptions (carried in the checkpoint), from which callers can
    replay the complete controlled trajectory.
    """
    from ..control.mpc import mpc_rollout

    total = cfg.n_steps
    d = 2 * ctrl.max_mode
    all_keys = jax.random.split(key, total)
    xdtype = np.asarray(state.x).dtype
    like = {
        "x": np.zeros_like(np.asarray(state.x)),
        "v": np.zeros_like(np.asarray(state.v)),
        "mean": np.zeros((mpc.horizon, d), dtype=xdtype),
        "coeffs": np.zeros((total, d), dtype=xdtype),
        "t_done": np.asarray(0),
    }

    t_done = 0
    mean = jnp.zeros((mpc.horizon, d), dtype=state.x.dtype)
    coeffs_full = np.zeros((total, d), dtype=xdtype)
    if ckpt_path and resume and os.path.exists(ckpt_path):
        ck = restore_checkpoint(ckpt_path, like=like)
        t_done = int(ck["t_done"])
        if 0 < t_done <= total:
            state = PlasmaState(jnp.asarray(ck["x"]), jnp.asarray(ck["v"]))
            mean = jnp.asarray(ck["mean"])
            # the checkpoint may come from a shorter-horizon run (e.g. an
            # interrupted run with a smaller t_max); keep its prefix
            done = np.asarray(ck["coeffs"])[:t_done]
            coeffs_full[: done.shape[0]] = done
            print(f"# resumed MPC from {ckpt_path} at step {t_done}")

    parts = {k: [] for k in (
        "field_energy", "kinetic", "hamiltonian", "coeffs", "input_energy", "plan_cost",
    )}
    while t_done < total:
        n = min(segment_steps, total - t_done)
        out = mpc_rollout(
            state, grid, cfg, ctrl, mpc, actuator, key,
            mean0=mean, step_keys=all_keys[t_done : t_done + n],
        )
        state = out.final_state
        mean = out.final_mean
        for k in parts:
            parts[k].append(np.asarray(getattr(out, k)))
        coeffs_full[t_done : t_done + n] = np.asarray(out.coeffs)
        t_done += n
        if ckpt_path:
            save_checkpoint(
                ckpt_path,
                {
                    "x": np.asarray(state.x),
                    "v": np.asarray(state.v),
                    "mean": np.asarray(mean),
                    "coeffs": coeffs_full,
                    "t_done": np.asarray(t_done),
                },
            )

    traces = {
        k: (np.concatenate(v) if v else np.zeros((0, d) if k == "coeffs" else (0,)))
        for k, v in parts.items()
    }
    traces["coeffs_full"] = coeffs_full
    return state, traces
