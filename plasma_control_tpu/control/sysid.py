"""Data-driven control: Hankel-DMDc system identification + LQR.

A new controller family the reference lacks: identify a linear time-delay
(Hankel) model of the Fourier-mode field dynamics from randomly-excited PIC
rollouts,

    h_{t+1} = A h_t + B u_t,   h_t = [z_t, ..., z_{t-D+1}, u_{t-1}, ..., u_{t-D+1}],

with z_t the complex E_k coefficients of the self-consistent field (the same
observable the phase-conjugate feedback law uses,
`/root/reference/run_feedback.py:133-135`), then play the infinite-horizon
LQR policy u = -K h. The delay embedding is essential: the 2K-dim mode state
alone is not Markov for the kinetic (Landau) dynamics — one-step residual
drops ~30x with D=6 lags (see DEVNOTES round-1 measurements).

Per-control-step cost is one deposit+solve+FFT+matvec — the same as the
feedback law and ~1000x cheaper than a sampling MPC solve. Measured
suppression sits between uncontrolled and the phase-conjugate expert
(tail PE ~155 vs 390 uncontrolled / 102 feedback on the two-stream test
config); the MPC engine remains the strongest controller.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ControlConfig, SimConfig
from ..diag.spectrum import e_k_coefficients
from ..models.pic import PlasmaState, init_state, step
from ..models.rollout import _energies
from ..ops.deposit import deposit
from ..ops.fields import solve_e_mesh
from ..ops.grid import Grid
from .actuator import FourierActuator

__all__ = [
    "mode_observable",
    "collect_excitation_data",
    "hankel_dmdc",
    "lqr_gain",
    "lqr_rollout",
    "identify_lqr_controller",
]


def mode_observable(x: jax.Array, grid: Grid, cfg: SimConfig, max_mode: int) -> jax.Array:
    """z = [Re Ek_1..K, Im Ek_1..K] of the self-consistent field (2K,)."""
    n = deposit(x, grid, n0=cfg.n0, kind=cfg.interpol, method=cfg.deposit_method)
    ek = e_k_coefficients(solve_e_mesh(n, grid, cfg.n0))[1 : max_mode + 1]
    return jnp.concatenate([jnp.real(ek), jnp.imag(ek)])


@partial(jax.jit, static_argnames=("cfg", "ctrl", "n_steps"))
def _excite_rollout(key, grid, actuator, cfg: SimConfig, ctrl: ControlConfig, n_steps: int, amplitude: float):
    ks = jax.random.split(key, n_steps)

    def body(carry: PlasmaState, k):
        z = mode_observable(carry.x, grid, cfg, ctrl.max_mode)
        u = amplitude * jax.random.normal(k, (ctrl.n_actions,))
        new = step(carry, grid, cfg, actuator.compute_e_packed(u))
        return new, (z, u)

    s0 = init_state(cfg, key)
    _, (zs, us) = jax.lax.scan(body, s0, ks)
    return zs, us


def collect_excitation_data(
    grid: Grid,
    actuator: FourierActuator,
    cfg: SimConfig,
    ctrl: ControlConfig,
    key: jax.Array,
    n_rollouts: int = 6,
    n_steps: int = 150,
    amplitude: float = 0.15,
) -> Tuple[np.ndarray, np.ndarray]:
    """Randomly-excited PIC rollouts; returns (Z (R, T, 2K), U (R, T, 2K))."""
    zs, us = [], []
    for i in range(n_rollouts):
        key, k = jax.random.split(key)
        z, u = _excite_rollout(k, grid, actuator, cfg, ctrl, n_steps, amplitude)
        zs.append(np.asarray(z))
        us.append(np.asarray(u))
    return np.stack(zs), np.stack(us)


def hankel_dmdc(Z: np.ndarray, U: np.ndarray, n_lags: int = 6):
    """Least-squares fit of the lifted linear model.

    Z, U: (R, T, 2K). Returns (A, B, residual) with the lifted state
    dimension 2K*n_lags + 2K*(n_lags-1).
    """
    X, Xp, Uc = [], [], []
    for zs, us in zip(Z, U):
        t_len = zs.shape[0]
        for t in range(n_lags, t_len - 1):
            h = np.concatenate([zs[t - d] for d in range(n_lags)] + [us[t - 1 - d] for d in range(n_lags - 1)])
            hp = np.concatenate([zs[t + 1 - d] for d in range(n_lags)] + [us[t - d] for d in range(n_lags - 1)])
            X.append(h)
            Xp.append(hp)
            Uc.append(us[t])
    X, Xp, Uc = np.array(X), np.array(Xp), np.array(Uc)
    G = np.concatenate([X, Uc], axis=1)
    AB, *_ = np.linalg.lstsq(G, Xp, rcond=None)
    nz = X.shape[1]
    A, B = AB[:nz].T, AB[nz:].T
    d = Z.shape[-1]
    pred = G @ AB
    residual = float(np.linalg.norm(pred[:, :d] - Xp[:, :d]) / np.linalg.norm(Xp[:, :d]))
    return A, B, residual


def lqr_gain(A: np.ndarray, B: np.ndarray, n_obs: int, q_weight: float = 1.0, r_weight: float = 0.5, iters: int = 800):
    """Discrete-time Riccati iteration; Q penalizes the lagged z block only."""
    nz = A.shape[0]
    qd = np.zeros(nz)
    qd[:n_obs] = q_weight
    Q = np.diag(qd)
    R = r_weight * np.eye(B.shape[1])
    P = Q.copy()
    for _ in range(iters):
        K = np.linalg.solve(R + B.T @ P @ B, B.T @ P @ A)
        P = Q + A.T @ P @ (A - B @ K)
    return K


class LQROutput(NamedTuple):
    final_state: PlasmaState
    field_energy: jax.Array  # (T,)
    coeffs: jax.Array  # (T, 2K)


@partial(jax.jit, static_argnames=("cfg", "ctrl", "n_lags", "n_steps"))
def lqr_rollout(
    state: PlasmaState,
    gain: jax.Array,  # (2K, H_dim)
    grid: Grid,
    actuator: FourierActuator,
    cfg: SimConfig,
    ctrl: ControlConfig,
    n_lags: int,
    n_steps: int,
) -> LQROutput:
    """Closed loop u = clip(-K h) with the lag buffers carried in the scan."""
    d = ctrl.n_actions

    def body(carry, _):
        env, hist_z, hist_u = carry
        z = mode_observable(env.x, grid, cfg, ctrl.max_mode)
        hist_z = jnp.concatenate([z[None], hist_z[:-1]])
        h = jnp.concatenate([hist_z.reshape(-1), hist_u.reshape(-1)])
        u = jnp.clip(-gain @ h, ctrl.coeff_min, ctrl.coeff_max)
        new = step(env, grid, cfg, actuator.compute_e_packed(u))
        if n_lags > 1:
            hist_u = jnp.concatenate([u[None], hist_u[:-1]])
        pe, _ = _energies(new, grid, cfg)
        return (new, hist_z, hist_u), (pe, u)

    h0 = (state, jnp.zeros((n_lags, d)), jnp.zeros((max(n_lags - 1, 1), d)))
    (final, _, _), (pe, us) = jax.lax.scan(body, h0, None, length=n_steps)
    return LQROutput(final, pe, us)


def identify_lqr_controller(
    grid: Grid,
    actuator: FourierActuator,
    cfg: SimConfig,
    ctrl: ControlConfig,
    key: jax.Array,
    n_lags: int = 6,
    n_rollouts: int = 6,
    excite_steps: int = 150,
    amplitude: float = 0.15,
    q_weight: float = 1.0,
    r_weight: float = 0.5,
):
    """End-to-end: excite -> Hankel-DMDc -> LQR gain. Returns (gain, info)."""
    Z, U = collect_excitation_data(grid, actuator, cfg, ctrl, key, n_rollouts, excite_steps, amplitude)
    A, B, residual = hankel_dmdc(Z, U, n_lags)
    K = lqr_gain(A, B, n_obs=2 * ctrl.max_mode * n_lags, q_weight=q_weight, r_weight=r_weight)
    info = {"residual": residual, "spectral_radius": float(np.max(np.abs(np.linalg.eigvals(A))))}
    return jnp.asarray(K, jnp.float32), info
