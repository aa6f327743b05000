"""Multi-host initialization & collectives policy.

The reference has NO distributed backend (SURVEY.md §2.2: no
NCCL/MPI/Gloo anywhere; cross-process transport is files/HTTP/subprocess).
On TPU pods the framework uses jax.distributed + one global mesh:

  * `initialize()` wires jax.distributed from TPU pod metadata (or
    explicit coordinator args for CPU/GPU clusters)
  * the mesh spans all global devices; per-host data loading feeds each
    process its local shard (`process_batch_slice`)
  * gradients all-reduce over ICI within a slice and DCN across slices —
    XLA picks the transport from the mesh's device order, so keeping the
    data axis contiguous per slice keeps collectives on ICI
    (make_slice_aware_mesh).
"""
from __future__ import annotations

import logging
from typing import Optional, Sequence, Tuple

import jax
import numpy as np

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed (no-op on a single process).

    On TPU pods all three args come from the environment automatically;
    returns (process_index, process_count).
    """
    try:
        if coordinator_address or num_processes:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes, process_id=process_id)
        elif jax.process_count() == 1 and _looks_like_pod():
            jax.distributed.initialize()
    except Exception as e:  # noqa: BLE001
        logger.info("jax.distributed not initialized (%s); single-process",
                    e)
    logger.info("process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())
    return jax.process_index(), jax.process_count()


def _looks_like_pod() -> bool:
    import os

    return any(k in os.environ for k in (
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS"))


def make_slice_aware_mesh(axis_names: Sequence[str] = ("data",)):
    """Mesh over all global devices, ordered so that devices within a
    slice (same ICI domain) are contiguous on the data axis — gradient
    all-reduce then rides ICI first and crosses DCN once per slice."""
    from jax.sharding import Mesh

    devices = sorted(jax.devices(),
                     key=lambda d: (getattr(d, "slice_index", 0) or 0,
                                    d.process_index, d.id))
    arr = np.asarray(devices)
    shape = [len(devices)] + [1] * (len(axis_names) - 1)
    return Mesh(arr.reshape(shape), tuple(axis_names))


def process_batch_slice(global_batch: int) -> Tuple[int, int, int]:
    """(local_batch, start_index, end_index) of this process's share of a
    global batch — for per-host data loading."""
    n = jax.process_count()
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by process count "
            f"{n}")
    local = global_batch // n
    start = jax.process_index() * local
    return local, start, start + local
