"""Multi-host initialization + cross-host synchronization helpers.

Role parity (reference, for cross-checking — original implementation):
  the reference's multi-node story is torch.distributed env-var
  initialization (MASTER_ADDR/PORT/WORLD_SIZE/RANK, train_v68.sh:7,
  SURVEY §2.8) plus dist.barrier()-then-merge patterns. Here:

  - `maybe_initialize()` calls `jax.distributed.initialize` when the
    standard env vars (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID,
    or their MASTER_* torch-style aliases) are present, and is a no-op for
    single-process runs — entry points can call it unconditionally;
  - `barrier()` synchronizes all hosts (the dist.barrier() before shard
    merges);
  - `all_gather_objects_via_host()` replaces the reference's pickle-tensor
    all_gather (comm.py:47-88) with multihost_utils broadcasting.
"""

from __future__ import annotations

import os
from typing import Any, List, Optional

import jax
import numpy as np

_initialized = False


def maybe_initialize() -> bool:
    """Initialize jax.distributed from env vars; no-op if single-process.

    Recognized env vars (first match wins):
      JAX_COORDINATOR_ADDRESS + JAX_NUM_PROCESSES + JAX_PROCESS_ID
      MASTER_ADDR[:MASTER_PORT] + WORLD_SIZE + RANK   (torch-style)
    Returns True when a multi-process runtime was initialized.
    """
    global _initialized
    if _initialized:
        return True
    coordinator = os.environ.get("JAX_COORDINATOR_ADDRESS")
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if coordinator is None and os.environ.get("MASTER_ADDR"):
        port = os.environ.get("MASTER_PORT", "1234")
        coordinator = f"{os.environ['MASTER_ADDR']}:{port}"
        num = os.environ.get("WORLD_SIZE")
        pid = os.environ.get("RANK")
    if not (coordinator and num and pid and int(num) > 1):
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num),
        process_id=int(pid),
    )
    _initialized = True
    return True


def barrier(name: str = "barrier") -> None:
    """Block until every host reaches this point (dist.barrier())."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def process_allgather(array: np.ndarray) -> np.ndarray:
    """Gather a per-host array to all hosts, stacked on a leading axis."""
    if jax.process_count() == 1:
        return np.asarray(array)[None]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(np.asarray(array)))
