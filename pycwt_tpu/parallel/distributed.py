"""Multi-host (multi-process) initialization and cache semantics.

The reference has no distributed backend at all (SURVEY.md §5).  For pod
slices spanning hosts, JAX's runtime handles DCN coordination; this module
wraps the initialization and gives the WCT-significance disk cache
host-0-writes semantics.
"""
from __future__ import annotations

import jax
import numpy as np

__all__ = ["initialize", "is_coordinator", "host_broadcast_array"]


def initialize(coordinator_address: str | None = None, num_processes: int | None = None,
               process_id: int | None = None):
    """Initialize the multi-process JAX runtime (DCN-spanning meshes).

    Thin wrapper over ``jax.distributed.initialize`` — arguments default to
    the TPU pod environment's auto-detection.  Call once per process before
    any device computation.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_coordinator() -> bool:
    """True on the process that owns host-side I/O (cache writes, prints)."""
    return jax.process_index() == 0


def host_broadcast_array(x: np.ndarray) -> np.ndarray:
    """Broadcast a small host array from process 0 to all processes via a
    device all-reduce (used to share cache-loaded MC significance curves)."""
    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.broadcast_one_to_all(x))
