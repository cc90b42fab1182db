"""Multi-host initialization helpers.

Single-slice multi-chip needs nothing (XLA collectives ride ICI inside
the slice).  Across hosts/slices, JAX's distributed runtime carries
control plane + DCN collectives; this wrapper standardizes the
environment-driven initialization so launcher jobs work unchanged on a
pod slice.
"""

from __future__ import annotations

import os

import jax


def initialize_if_needed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when a multi-host environment is
    detected (or explicit args are given).  Returns True if initialized.

    Environment contract (same names the JAX ecosystem uses):
        JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID
    TPU pod slices auto-detect all three when none are set.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def _int_env(name: str) -> int | None:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_primary() -> bool:
    """True on the process that should write checkpoints/metrics."""
    return jax.process_index() == 0
