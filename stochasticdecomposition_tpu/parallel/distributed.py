"""Multi-host scaffolding.

The reference is single-process (SURVEY.md §2c); multi-host here means
initializing the JAX distributed runtime so jax.devices() spans all hosts
and the (rep, obs) mesh of parallel/runner.py shards replications across
them (ICI within a slice, DCN across slices).  Replications are
embarrassingly parallel until the compromise stage, which gathers
per-replication incumbents/cuts to process 0 (compromise.c:249-311).
"""

from __future__ import annotations

import os
from typing import Optional

_initialized = False


def maybe_initialize(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when multi-host coordinates are available.

    Coordinates come from the arguments or, when omitted, from the standard
    environment (JAX auto-detects Cloud TPU metadata; otherwise
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID).  Returns True when
    the distributed runtime was initialized, False for single-process runs.
    Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return True

    import jax

    env = os.environ
    coordinator_address = coordinator_address or env.get(
        "COORDINATOR_ADDRESS")
    if num_processes is None and env.get("NUM_PROCESSES"):
        num_processes = int(env["NUM_PROCESSES"])
    if process_id is None and env.get("PROCESS_ID"):
        process_id = int(env["PROCESS_ID"])

    if coordinator_address is None and num_processes is None:
        # Nothing configured: stay single-process.
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id)
    _initialized = True
    return True


def is_coordinator() -> bool:
    """True on the process that should own host-side epilogues (the
    compromise QP, result files); always True single-process."""
    import jax

    return jax.process_index() == 0
