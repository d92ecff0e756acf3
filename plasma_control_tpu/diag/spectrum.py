"""E(k, t) Fourier spectrum diagnostics.

Capability parity with ``compute_E_k_spectrum``
(`/root/reference/src/interpret/spectrum.py:4-28`): for each snapshot column,
re-deposit + re-solve to E_mesh(t), FFT along the mesh axis with the
reference's normalization ``fft(E)/M*2``, keep k >= 0. The complex form of the
first ``max_mode`` positive-k coefficients is the input to the phase-conjugate
feedback law (`/root/reference/run_feedback.py:133-135`).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deposit import deposit
from ..ops.fields import solve_e_mesh
from ..ops.grid import Grid

__all__ = ["e_k_coefficients", "compute_e_k_spectrum", "spectrum_wavenumbers"]


def spectrum_wavenumbers(n_mesh: int, dx: float) -> np.ndarray:
    """Non-negative wavenumbers 2*pi*fftfreq (parity with `spectrum.py:17,27`)."""
    ks = np.fft.fftfreq(n_mesh, d=dx) * 2.0 * np.pi
    return ks[ks >= 0]


@jax.jit
def e_k_coefficients(e_mesh: jax.Array) -> jax.Array:
    """Complex spectrum fft(E)/M*2 along the last axis (all modes).

    Works on (M,) or batched (..., M) mesh fields.
    """
    m = e_mesh.shape[-1]
    return jnp.fft.fft(e_mesh, axis=-1) / m * 2.0


@partial(jax.jit, static_argnames=("n_mesh", "return_abs"))
def compute_e_k_spectrum(
    n0: float,
    grid: Grid,
    snapshot: jax.Array,
    n_mesh: int,
    return_abs: bool = True,
) -> jax.Array:
    """Spectrum for a (2N, Nt) snapshot: returns (n_keep, Nt) array with
    k >= 0 rows (parity with `spectrum.py:13-28`). Use
    :func:`spectrum_wavenumbers` for the matching k values."""
    n = snapshot.shape[0] // 2
    xs = snapshot[:n].T  # (Nt, N)
    dens = jax.vmap(lambda x: deposit(x, grid, n0=n0, kind="cic", method="dense"))(xs)
    e_mesh = solve_e_mesh(dens, grid, n0)  # (Nt, M)
    ek = e_k_coefficients(e_mesh)  # (Nt, M) complex
    # np.fft.fftfreq marks the Nyquist mode negative for even M, so k >= 0
    # keeps M//2 entries (even) or (M+1)//2 (odd) — parity with spectrum.py:27.
    n_keep = n_mesh // 2 if n_mesh % 2 == 0 else (n_mesh + 1) // 2
    ek = ek[:, :n_keep].T  # (n_keep, Nt), k >= 0 rows
    if return_abs:
        return jnp.abs(ek)
    return ek
