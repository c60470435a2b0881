"""Multi-host utilities: initialization and eval-result gathering.

The reference gathers python prediction dicts across ranks with
``dist.all_gather_object`` (`/root/reference/main.py:294-301`), which has no
XLA equivalent.  The TPU-native restructuring (SURVEY.md section 5): eval
produces *numeric* per-shard arrays (token ids, hidden states, edge
matrices), which are gathered as tensors across hosts; only rank 0 then runs
the host chemistry.  On a single process these helpers are no-ops, so the
same code path runs everywhere.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Multi-host runtime init (`torch.distributed.init_process_group`
    analogue, `main.py:577-581`).  No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_count() -> int:
    try:
        return jax.process_count()
    except Exception:
        return 1


def is_main_process() -> bool:
    try:
        return jax.process_index() == 0
    except Exception:
        return True


def gather_arrays(x: np.ndarray) -> np.ndarray:
    """All-gather a per-host numeric array along axis 0.

    Single-process: identity.  Multi-host: uses
    ``multihost_utils.process_allgather`` (the tensorized replacement for
    the reference's ``all_gather_object`` of dicts).
    """
    if process_count() <= 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x))


def barrier(name: str = "barrier") -> None:
    """Cross-host sync point (`dist.barrier`, `main.py:369`)."""
    if process_count() <= 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
