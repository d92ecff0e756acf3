"""Numerical guards and small array utilities.

Parity with `/root/reference/src/util.py:3-33` (``check_invalid_value``,
``temperal_average``), trace-friendly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["check_invalid_value", "temporal_average"]


@jax.jit
def check_invalid_value(x: jax.Array) -> jax.Array:
    """True if NaN/Inf anywhere or |x| > 1e4 (parity with `src/util.py:3-14`).
    Returns a traced boolean (usable in ``lax.cond``/``jnp.where``)."""
    finite = jnp.all(jnp.isfinite(x))
    overflow = jnp.max(jnp.abs(x)) > 1e4
    return jnp.logical_or(~finite, overflow)


@jax.jit
def temporal_average(y: jax.Array, k: int) -> jax.Array:
    """Sliding mean over a window of k (parity with ``temperal_average``,
    `src/util.py:16-33`, including its asymmetric edge clamping)."""
    n = y.shape[0]
    idx = jnp.arange(n)
    start = jnp.clip(idx - k // 2, 0, n - 1)
    end = jnp.clip(idx + k // 2, 0, n - 1)
    csum = jnp.concatenate([jnp.zeros(1, y.dtype), jnp.cumsum(y)])
    cnt = jnp.maximum(end - start, 1)
    return (csum[end] - csum[start]) / cnt
