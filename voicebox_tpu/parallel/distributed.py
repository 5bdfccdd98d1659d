"""Multi-host bootstrap.

The reference gets its launch topology from `accelerate launch` env vars
(SURVEY.md §5, trainer.py:89-95). The JAX-native equivalent is
`jax.distributed.initialize()`, which wires every host into one SPMD world so
`jax.devices()` spans all chips and the trainer's mesh covers the full slice.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

__all__ = ["maybe_initialize_distributed", "is_multihost", "process_index"]

_initialized = False


def maybe_initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialise multi-host JAX if the environment asks for it.

    Explicit args win; otherwise standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or a TPU
    pod environment where initialize() needs no args). Safe to call more than
    once and on single-host setups (no-ops). Returns True when a multi-process
    world was set up."""
    global _initialized
    if _initialized:
        return True

    explicit = coordinator_address is not None
    from_env = os.environ.get("JAX_COORDINATOR_ADDRESS") is not None
    on_pod = os.environ.get("TPU_WORKER_HOSTNAMES") is not None

    if not (explicit or from_env or on_pod):
        return False

    kwargs = {}
    if explicit:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif from_env:
        # jax.distributed.initialize only auto-reads JAX_COORDINATOR_ADDRESS;
        # the process-topology vars this module documents must be passed
        # explicitly or the cluster detector raises
        kwargs = dict(
            coordinator_address=os.environ["JAX_COORDINATOR_ADDRESS"],
            num_processes=int(os.environ["JAX_NUM_PROCESSES"])
            if "JAX_NUM_PROCESSES" in os.environ else None,
            process_id=int(os.environ["JAX_PROCESS_ID"])
            if "JAX_PROCESS_ID" in os.environ else None,
        )
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True


def is_multihost() -> bool:
    return jax.process_count() > 1


def process_index() -> int:
    return jax.process_index()
