"""Multi-host training bring-up: jax.distributed + per-process data feeds.

The reference has no distributed layer (SURVEY §2.3 — zero
torch.distributed imports); this framework trains multi-host with the
standard JAX recipe (docs/training.md): every process calls
:func:`initialize`, builds ONE global mesh over all devices (dp spans
hosts over DCN, tp stays intra-host on ICI), and feeds its local shard of
the global batch, which :func:`global_batch` assembles into a globally
sharded array. Tested for real with two coordinated CPU processes in
tests/test_distributed.py (the same code path a TPU pod runs).
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence

import jax


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> dict:
    """Bring up jax.distributed (idempotent; no-op for single-process runs).

    Args resolve from the standard env vars when omitted
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID —
    cluster launchers like GKE/JobSet set the equivalents, and JAX
    auto-detects on Cloud TPU pods when everything is omitted).

    Returns {"process_index", "process_count", "local_devices",
    "global_devices"} for logging.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # Do NOT touch the backend before initialize (jax.process_count()
    # would boot XLA and make initialization impossible).
    if coordinator_address or (num_processes or 0) > 1:
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id)
        except RuntimeError as e:  # idempotence: already initialized
            if "already" not in str(e).lower():
                raise
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def process_shard(items: Sequence[Any],
                  process_index: Optional[int] = None,
                  process_count: Optional[int] = None) -> list[Any]:
    """This process's round-robin share of a list (shard files, voice dirs,
    eval sets). Deterministic across processes."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    return [x for i, x in enumerate(items) if i % pc == pi]


def global_batch(mesh, pspec, local_arr):
    """Assemble each process's LOCAL batch shard into one globally sharded
    array for the jitted train step. `local_arr` is this process's slice
    of the global batch along the dp axis (axis 0)."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, pspec)
    return jax.make_array_from_process_local_data(sharding, local_arr)
