"""Time integrators: symplectic kick/drift family + explicit baselines.

Capability parity with `/root/reference/src/env/integration.py:8-103` but
functional and trace-friendly:

* The reference evaluates its full state-gradient (including a complete
  deposit + Poisson solve) up to 7 times per Yoshida step even though drift
  substeps only need velocities (SURVEY.md §3.1). Here kick and drift are
  separate closed-form updates, so a Yoshida-4 step costs exactly **3** field
  solves (the d-coefficients) and zero redundant work.
* The stage ordering reproduces the reference composition exactly:
  ``_symplectic_forward_step`` kicks with E evaluated at the *current*
  positions then drifts with the *updated* velocities
  (`/root/reference/src/env/integration.py:22-47`), applied with Yoshida
  coefficients (c1,0), (c2,d1), (c3,d2), (c4,d3)
  (`/root/reference/src/env/integration.py:60-75`).

Generic ``grad_fn``-based integrators (forward Euler, explicit midpoint,
implicit midpoint) are provided for API parity; they take
``grad_fn(eta) -> d(eta)/dt`` over the packed state ``eta = [x; v]``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "yoshida4_coefficients",
    "kick_drift_step",
    "yoshida4_step",
    "verlet_step",
    "symplectic_euler_step",
    "forward_euler",
    "explicit_midpoint",
    "implicit_midpoint",
    "INTEGRATORS",
]

AccelFn = Callable[[jax.Array], jax.Array]  # x -> dv/dt
GradFn = Callable[[jax.Array], jax.Array]  # eta -> d(eta)/dt


def yoshida4_coefficients() -> Tuple[Tuple[float, ...], Tuple[float, ...]]:
    """Yoshida 4th-order composition coefficients
    (`/root/reference/src/env/integration.py:62-69`)."""
    phi = 2.0 ** (1.0 / 3.0)
    w0 = -phi / (2.0 - phi)
    w1 = 1.0 / (2.0 - phi)
    c = (0.5 * w1, 0.5 * (w0 + w1), 0.5 * (w0 + w1), 0.5 * w1)
    d = (w1, w0, w1)
    return c, d


def kick_drift_step(
    x: jax.Array,
    v: jax.Array,
    accel_fn: AccelFn,
    dt: float,
    cs: Sequence[float],
    ds: Sequence[float],
) -> Tuple[jax.Array, jax.Array]:
    """Generic splitting: drift(c0), then (kick(d_i), drift(c_{i+1})) pairs.

    Matches the reference's stage semantics where each stage kicks with the
    field at the pre-drift positions of that stage
    (`/root/reference/src/env/integration.py:32-42`).
    """
    assert len(cs) == len(ds) + 1
    x = x + cs[0] * dt * v
    for c, d in zip(cs[1:], ds):
        v = v + d * dt * accel_fn(x)
        x = x + c * dt * v
    return x, v


def yoshida4_step(x, v, accel_fn: AccelFn, dt: float):
    """4th-order symplectic step; 3 field evaluations."""
    c, d = yoshida4_coefficients()
    return kick_drift_step(x, v, accel_fn, dt, c, d)


def verlet_step(x, v, accel_fn: AccelFn, dt: float):
    """Stormer-Verlet as composed by the reference
    (`/root/reference/src/env/integration.py:54-58`): stage (c=1, d=0.5) then
    (c=0, d=0.5) — i.e. kick(half, at x0) -> drift(full) -> kick(half, at x1)."""
    v = v + 0.5 * dt * accel_fn(x)
    x = x + dt * v
    v = v + 0.5 * dt * accel_fn(x)
    return x, v


def symplectic_euler_step(x, v, accel_fn: AccelFn, dt: float):
    """1st-order symplectic (`/root/reference/src/env/integration.py:50-52`)."""
    v = v + dt * accel_fn(x)
    x = x + dt * v
    return x, v


# ---------------------------------------------------------------------------
# Generic packed-state integrators (API parity; non-symplectic baselines)
# ---------------------------------------------------------------------------


def forward_euler(eta: jax.Array, grad_fn: GradFn, dt: float) -> jax.Array:
    """Parity with `/root/reference/src/env/integration.py:8-10`."""
    return eta + dt * grad_fn(eta)


def explicit_midpoint(eta: jax.Array, grad_fn: GradFn, dt: float) -> jax.Array:
    """Parity with `/root/reference/src/env/integration.py:12-17`."""
    g = grad_fn(eta)
    return eta + dt * grad_fn(eta + 0.5 * dt * g)


def _is_invalid(x: jax.Array) -> jax.Array:
    """Trace-friendly NaN/Inf/overflow guard — parity with
    ``check_invalid_value`` (`/root/reference/src/util.py:3-14`)."""
    finite = jnp.all(jnp.isfinite(x))
    overflow = jnp.max(jnp.abs(x)) > 1e4
    return jnp.logical_or(~finite, overflow)


def _verlet_packed(eta: jax.Array, grad_fn: GradFn, dt: float) -> jax.Array:
    n = eta.shape[0] // 2
    x, v = eta[:n], eta[n:]

    def accel(xq):
        return grad_fn(jnp.concatenate([xq, v]))[n:]

    x2, v2 = verlet_step(x, v, accel, dt)
    return jnp.concatenate([x2, v2])


def implicit_midpoint(
    eta: jax.Array,
    grad_fn: GradFn,
    dt: float,
    n_epochs: int = 100,
    eps: float = 1e-12,
    alpha: float = 0.5,
) -> jax.Array:
    """Fixed-point implicit midpoint with divergence guard and Verlet fallback
    — parity with `/root/reference/src/env/integration.py:78-103`, expressed as
    a ``lax.while_loop`` so it stays inside one compiled program.
    """
    dx0 = _verlet_packed(eta, grad_fn, dt) - eta

    def g(dx):
        return grad_fn(0.5 * dx + eta) * dt

    def cond(carry):
        dx, it, converged, invalid = carry
        return (it < n_epochs) & ~converged & ~invalid

    def body(carry):
        dx, it, _, _ = carry
        dx_new = (1.0 - alpha) * dx + alpha * g(dx)
        converged = jnp.linalg.norm(dx_new - dx) < eps
        return dx_new, it + 1, converged, _is_invalid(dx_new)

    dx, _, converged, _ = jax.lax.while_loop(cond, body, (dx0, 0, jnp.array(False), jnp.array(False)))
    fallback = _verlet_packed(eta, grad_fn, dt)
    return jnp.where(converged, eta + dx, fallback)


#: name -> (x, v, accel_fn, dt) -> (x, v) steppers for the PIC hot loop
INTEGRATORS = {
    "symplectic_euler": symplectic_euler_step,
    "verlet": verlet_step,
    "yoshida4": yoshida4_step,
}
