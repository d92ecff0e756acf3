"""Multi-host launch helpers.

The reference has no distributed runtime (SURVEY §2.6). On a TPU slice, each
host process calls :func:`initialize_distributed` once before any jax call
that touches devices; collectives then ride ICI within the slice and DCN
across hosts through the standard `jax.distributed` rendezvous. On
single-host (or CPU test) environments this is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["initialize_distributed", "is_multihost", "process_summary"]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize jax.distributed if a multi-host environment is detected or
    explicitly configured. Returns True if distributed mode is active.

    Auto-detects TPU pod environments (the TPU runtime supplies coordinator
    details); explicit arguments/environment variables
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``)
    cover manual launches.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Rely on TPU auto-bootstrap when available; otherwise single-process.
        try:
            jax.distributed.initialize()
        except Exception:
            return False
        return jax.process_count() > 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_summary() -> str:
    return (
        f"process {jax.process_index()}/{jax.process_count()}, "
        f"{jax.local_device_count()} local / {jax.device_count()} global devices"
    )
