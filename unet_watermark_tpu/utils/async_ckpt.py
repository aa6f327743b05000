"""Async checkpoint writes: keep the train loop off the disk.

The reference saves torch checkpoints synchronously inside the epoch loop
(/root/reference/src/train.py:425-460); on this framework's target hosts
the D2H fetch + orbax/.pth/.npz writes cost seconds per save and were one
of the three host-bound-epoch culprits (round-2 VERDICT). Here a save is:

  1. an on-device `jnp.copy` snapshot of the state (required: the train
     step donates its input state, so the live buffers die at the next
     step dispatch — a background thread must read from buffers it owns)
  2. a queued job on ONE worker thread that does the D2H transfer and all
     disk formats while the device trains on

Ordering is preserved (single worker, FIFO). `flush()` joins the queue;
worker exceptions are re-raised there so failed saves are loud.
"""
from __future__ import annotations

import logging
import queue
import threading
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)


def snapshot_state(state) -> Any:
    """On-device copy of every array leaf — safe against buffer donation
    by subsequent train steps, and cheap (HBM-to-HBM)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.copy(x) if isinstance(x, jax.Array) else x, state)


def host_snapshot(state) -> Any:
    """Leaf-by-leaf synchronous D2H fetch of the live state — ZERO extra
    HBM (no on-device copy; residency during the fetch is one leaf's
    transfer buffer). Used for the periodic FULL checkpoints: their
    on-device snapshot (params + Adam m/v ≈ 3x params) is what OOM'd the
    batch-128 epoch-scan run at epoch 30 beside the resident corpus.
    Blocks the train loop for the D2H (~40 s over the slow tunnel) —
    acceptable once per SAVE_INTERVAL epochs; best-saves keep the
    overlapped on-device slim snapshot."""
    import numpy as np

    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, state)


def slim_snapshot(state) -> Any:
    """Inference-grade snapshot: params/batch_stats/step WITHOUT the
    optimizer state. Best-model saves fire on every improving epoch and
    their snapshot lives on device until the (slow-tunnel) D2H completes;
    dropping opt_state cuts that residency ~3× (Adam m/v). Mirrors the
    reference, whose best-model file is also a slimmer dict than its
    periodic checkpoints (/root/reference/src/train.py:428-435 vs
    :438-460). Restoring a slim checkpoint through restore_checkpoint
    yields params/batch_stats with a fresh optimizer (the documented
    fallback); full-fidelity resume uses the periodic checkpoints."""
    return snapshot_state(state.replace(opt_state=None))


class AsyncSaver:
    """Single background worker running queued save jobs in order.

    max_pending=1: at most one save queued behind the in-flight one, so
    no more than two snapshots are device-resident at a time — on a
    16 GB chip with a device-cached corpus the snapshot+staging spike of
    deeper queues was observed to OOM the train step (round-3 log)."""

    def __init__(self, max_pending: int = 1):
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._errors: List[BaseException] = []
        self._thread: Optional[threading.Thread] = None

    def _ensure_worker(self):
        if self._thread is None or not self._thread.is_alive():
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self):
        while True:
            job = self._q.get()
            fn = args = kwargs = None
            try:
                if job is None:
                    return
                fn, args, kwargs = job
                fn(*args, **kwargs)
            except BaseException as e:  # noqa: BLE001 — surfaced in flush
                logger.warning("async checkpoint save failed: %s", e)
                self._errors.append(e)
            finally:
                # drop the job BEFORE blocking on the next q.get(): the
                # local otherwise pins the finished save's on-device
                # snapshot (~100 MB) until the next job arrives — enough
                # retained HBM to OOM a batch-128 run beside a resident
                # corpus (round-4 seg_r5 extension log)
                job = fn = args = kwargs = None
                self._q.task_done()

    def submit(self, fn: Callable, *args, **kwargs) -> None:
        """Queue `fn(*args)` on the worker. Blocks only when max_pending
        saves are already queued (back-pressure, bounded memory)."""
        self._ensure_worker()
        self._q.put((fn, args, kwargs))

    def busy(self) -> bool:
        """True while any queued or in-flight save has not finished —
        i.e. while its on-device snapshot is still resident. Callers on
        tight HBM budgets (batch-128 epoch-scan beside a resident
        corpus) skip a new snapshot while one is outstanding."""
        return self._q.unfinished_tasks > 0

    def flush(self, raise_errors: bool = True) -> None:
        """Wait for all queued saves; re-raise the first worker error."""
        self._q.join()
        if raise_errors and self._errors:
            err, self._errors = self._errors[0], []
            raise err

    def close(self) -> None:
        self.flush(raise_errors=False)
        if self._thread is not None and self._thread.is_alive():
            self._q.put(None)
            self._thread.join(timeout=30)
