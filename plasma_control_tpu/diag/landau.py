"""Landau damping / instability-rate diagnostics.

Capability parity with `/root/reference/src/interpret/landau.py:5-75`
(``compute_bounce_time``, ``compute_numerical_entropy``,
``compute_linear_damping_rate_analytic``, ``compute_linear_damping_rate``).
The sklearn LinearRegression of the reference becomes a closed-form
least-squares slope in jnp.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..control.objective import phase_space_histogram
from ..ops.deposit import deposit
from ..ops.fields import solve_e_mesh
from ..ops.grid import Grid

__all__ = [
    "compute_bounce_time",
    "compute_numerical_entropy",
    "compute_linear_damping_rate_analytic",
    "compute_linear_damping_rate",
    "damping_rate_from_field_energy",
]


def compute_bounce_time(perturbed_amplitude: float) -> float:
    """1/sqrt(A) (parity with `landau.py:5-14`)."""
    return 1.0 / np.sqrt(perturbed_amplitude)


@partial(jax.jit, static_argnames=("n_mesh", "nv_mesh"))
def compute_numerical_entropy(
    snapshot_col: jax.Array,
    n_mesh: int,
    nv_mesh: int,
    length: float,
    dx: float,
    vmin: float,
    vmax: float,
    dv: float,
    n0: float,
) -> jax.Array:
    """-sum f ln f dx dv from a 2D histogram (parity with `landau.py:16-26`).

    Note the reference computes its v-bin count as ``int(vmax - vmin/dv)``
    (a precedence bug); here the caller passes ``nv_mesh`` explicitly.
    """
    n = snapshot_col.shape[0] // 2
    hist = phase_space_histogram(snapshot_col[:n], snapshot_col[n:], max(n_mesh, nv_mesh), length, vmin, vmax)
    # reference uses [N_mesh, Nv_mesh] bins; our histogram is square — use
    # n_mesh == nv_mesh for exact parity.
    f = hist * (n0 / dx / dv / n)
    terms = jnp.where(f != 0, f * jnp.log(jnp.where(f != 0, f, 1.0)), 0.0)
    return -jnp.sum(terms) * dx * dv


def compute_linear_damping_rate_analytic(k: float, v_th: float, n0: float) -> float:
    """Textbook Landau rate (parity with `landau.py:28-42`)."""
    w_pe = np.sqrt(4.0 * np.pi * n0)
    lamda_de = v_th / w_pe
    kl = k * lamda_de
    return float(np.exp(-1.0 / (2.0 * kl**2)) / kl**3 * np.sqrt(np.pi / 8.0) * w_pe)


@jax.jit
def _lstsq_slope(t: jax.Array, y: jax.Array) -> jax.Array:
    tm = t - jnp.mean(t)
    return jnp.sum(tm * (y - jnp.mean(y))) / jnp.sum(tm * tm)


@partial(jax.jit, static_argnames=("n_mesh",))
def compute_linear_damping_rate(
    tmax: float,
    n0: float,
    grid: Grid,
    snapshot: jax.Array,
    n_mesh: int,
) -> jax.Array:
    """gamma from the regression log E^2(t) = 2 gamma t + C over re-solved
    fields (parity with `landau.py:44-75`; sklearn fit -> closed-form slope)."""
    n = snapshot.shape[0] // 2
    nt = snapshot.shape[1]
    xs = snapshot[:n].T  # (Nt, N)
    dens = jax.vmap(lambda x: deposit(x, grid, n0=n0, kind="cic", method="dense"))(xs)
    e_mesh = solve_e_mesh(dens, grid, n0)  # (Nt, M)
    e2 = jnp.sum(e_mesh**2, axis=-1) * grid.dx
    ts = jnp.linspace(0.0, tmax, nt)
    return 0.5 * _lstsq_slope(ts, jnp.log(e2))


@jax.jit
def damping_rate_from_field_energy(ts: jax.Array, pe: jax.Array) -> jax.Array:
    """Same regression applied directly to a recorded PE(t) series — the
    rollout records field energy natively, so no snapshot re-solve is needed
    (PE differs from sum E^2 dx only by the constant N/(2L), which does not
    change the log-slope)."""
    return 0.5 * _lstsq_slope(ts, jnp.log(pe))
