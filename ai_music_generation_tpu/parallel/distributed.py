"""Multi-host initialization helper.

Replaces the reference's torchrun/NCCL rendezvous (RANK/LOCAL_RANK/
WORLD_SIZE env handling, ref: nanoGPT/train.py:9-17,86-99) with the JAX
runtime's single call: every host runs the SAME command; the mesh then spans
all global devices, XLA routes intra-slice collectives over ICI and
cross-slice over DCN.

On a single host (or under the test harness) this is a no-op.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize multi-host JAX when launched across hosts.

    Arguments default from the standard env (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID); on TPU pods all three are
    auto-detected by the runtime and may be omitted entirely.

    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}.
    """
    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else _int_env("JAX_PROCESS_ID")

    # decide from env/args ONLY: touching jax.process_count() here would
    # initialize the backend and make jax.distributed.initialize() raise
    multi_host = coordinator_address is not None or (num_processes or 1) > 1
    if multi_host:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def _int_env(name: str) -> Optional[int]:
    val = os.environ.get(name)
    return int(val) if val else None


def is_main_process() -> bool:
    """The master-only-logging gate (replaces ref's master_process flag,
    nanoGPT/train.py:90-95)."""
    return jax.process_index() == 0
