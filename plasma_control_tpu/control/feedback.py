"""FFT phase-conjugate feedback controller, fully compiled closed loop.

Capability parity with the control law of `/root/reference/run_feedback.py:130-143`:
per step, take the complex spectrum Ek of the current *self-consistent* field,
set ``a_n = -Re(Ek_n)``, ``b_n = +Im(Ek_n)`` for n = 1..max_mode, synthesize
E_in on the mesh through the actuator, and advance one PIC step with it held
constant. The reference runs this as a Python loop with a full snapshot-based
spectrum recomputation each step (one deposit+solve per call,
`spectrum.py:13`); here the whole closed loop is one ``lax.scan`` and the
field is solved once per step via a circulant matmul.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import ControlConfig, SimConfig
from ..diag.spectrum import e_k_coefficients
from ..models.pic import PlasmaState, step
from ..models.rollout import _energies
from ..ops.deposit import deposit
from ..ops.fields import solve_e_mesh
from ..ops.grid import Grid
from .actuator import FourierActuator

__all__ = ["feedback_coefficients", "feedback_rollout", "FeedbackOutput"]


class FeedbackOutput(NamedTuple):
    final_state: PlasmaState
    field_energy: jax.Array  # (T,) PE after each step
    kinetic: jax.Array
    hamiltonian: jax.Array
    coeff_cos: jax.Array  # (T, K) applied cosine coefficients
    coeff_sin: jax.Array  # (T, K)
    input_energy: jax.Array  # (T,) control effort per step
    xs: Optional[jax.Array]  # (T+1, N) if recorded
    vs: Optional[jax.Array]


def feedback_coefficients(e_mesh: jax.Array, max_mode: int):
    """Phase-conjugate law: (a, b) = (-Re Ek, +Im Ek) for modes 1..K
    (parity with `/root/reference/run_feedback.py:133-135`)."""
    ek = e_k_coefficients(e_mesh)
    modes = ek[..., 1 : max_mode + 1]
    return -jnp.real(modes), jnp.imag(modes)


@partial(jax.jit, static_argnames=("cfg", "ctrl", "record_snapshots", "n_steps"))
def feedback_rollout(
    state: PlasmaState,
    grid: Grid,
    cfg: SimConfig,
    ctrl: ControlConfig,
    actuator: FourierActuator,
    record_snapshots: bool = False,
    n_steps: Optional[int] = None,
) -> FeedbackOutput:
    """Closed-loop feedback run of ``n_steps`` (default cfg.n_steps)."""
    t = n_steps if n_steps is not None else cfg.n_steps

    def body(carry: PlasmaState, _):
        dens = deposit(carry.x, grid, n0=cfg.n0, kind=cfg.interpol, method=cfg.deposit_method)
        e_mesh = solve_e_mesh(dens, grid, cfg.n0)
        a, b = feedback_coefficients(e_mesh, ctrl.max_mode)
        e_ext = actuator.compute_e(a, b)
        new = step(carry, grid, cfg, e_ext)
        pe, ke = _energies(new, grid, cfg)
        ie = actuator.input_energy(jnp.concatenate([a, b]))
        out = (pe, ke, a, b, ie) + ((new.x, new.v) if record_snapshots else ())
        return new, out

    final, outs = jax.lax.scan(body, state, None, length=t)
    pe, ke, a, b, ie = outs[:5]
    if record_snapshots:
        xs = jnp.concatenate([state.x[None], outs[5]])
        vs = jnp.concatenate([state.v[None], outs[6]])
    else:
        xs = vs = None
    return FeedbackOutput(
        final_state=final,
        field_energy=pe,
        kinetic=ke,
        hamiltonian=pe + ke,
        coeff_cos=a,
        coeff_sin=b,
        input_energy=ie,
        xs=xs,
        vs=vs,
    )
