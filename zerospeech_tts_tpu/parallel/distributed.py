"""Multi-host initialization (SURVEY.md §5 "Distributed communication
backend": the rebuild's comm story is jax.distributed + XLA collectives —
ICI within a slice, DCN across slices — surfaced only through mesh axes).

On a multi-host TPU slice each host runs the same program and calls
:func:`initialize` first; ``jax.devices()`` then spans the whole slice and
``make_mesh`` lays the global mesh over it. Nothing else in the framework
changes — shardings and pjit do the rest. Single-host (including the CI
fake-device mesh) is a no-op.
"""

from __future__ import annotations

import os


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host.

    With no arguments, auto-detects from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
    TPU metadata on Cloud TPU). Returns True if distributed mode was
    initialized, False for single-process runs.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False  # single host
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    import jax

    return jax.process_index() == 0
