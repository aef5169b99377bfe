"""Multi-host (DCN) initialization for pod-scale training.

The reference has no distributed backend at all (SURVEY §2 comm table).
Here multi-host runs use the standard JAX recipe: every host calls
``initialize_multihost()`` before first device use; GSPMD then treats the
whole pod as one device mesh, with gradient all-reduce riding ICI inside a
slice and DCN across slices. The training code is unchanged — the same
``make_mesh()`` simply sees more devices.
"""

from __future__ import annotations

import os

import jax


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed from args or env; returns True if multi-host.

    No-ops (returns False) when single-process: safe to call unconditionally
    from CLIs. Env fallbacks: COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID (and the TPU auto-detection built into
    ``jax.distributed.initialize`` when on a multi-host TPU slice).
    """
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def per_host_batch_slice(global_batch: int) -> tuple[int, int]:
    """(host_batch, offset) for this process's shard of a global batch."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch % n:
        raise ValueError(f"global batch {global_batch} not divisible by {n} hosts")
    host = global_batch // n
    return host, i * host
