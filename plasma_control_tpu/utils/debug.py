"""Debug toggles (SURVEY §5 'race detection / sanitizers' analogue).

Data races cannot occur by construction (deterministic dense deposition, no
scatter in the default path); the numerical-sanity story is NaN detection:
set ``PLASMA_DEBUG_NANS=1`` (or call :func:`enable_nan_checks`) to make every
jitted program fail loudly at the op that produced a NaN.
"""

from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["enable_nan_checks", "nan_checks"]


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


@contextlib.contextmanager
def nan_checks():
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


if os.environ.get("PLASMA_DEBUG_NANS") == "1":  # pragma: no cover
    enable_nan_checks()
