"""Batch planning — the static-shapes replacement for adaptive batching.

The reference's AdaptiveBatchProcessor reacts to OOM at runtime: catch,
halve, retry (adaptive_batch_processor.py:122-134,286-299), with a
binary-search BatchSizeOptimizer (:366-444). Under XLA, changing batch size
means recompiling, so reacting is the wrong shape — instead the
BatchPlanner asks the compiler for the memory plan of candidate batch
sizes AHEAD of time and commits to the largest power-of-two bucket that
fits. The AdaptiveBatchProcessor host-job API is kept for processing
arbitrary item lists with a fallback ladder (the part of the reference
semantics that still makes sense: per-chunk failure → halve the chunk).
"""
from __future__ import annotations

import logging
import math
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

from .memory import TPUMemoryManager, get_global_memory_manager

logger = logging.getLogger(__name__)


class BatchSizeOptimizer:
    """Find the largest batch size whose compiled program fits in HBM
    (adaptive_batch_processor.py:366-444 analog, but exact + ahead of
    time)."""

    def __init__(self, make_jitted_fn: Callable[[int], tuple],
                 max_batch: int = 256,
                 memory_manager: Optional[TPUMemoryManager] = None,
                 safety: float = 0.9):
        """make_jitted_fn(batch) -> (jitted_fn, example_args)."""
        self.make_jitted_fn = make_jitted_fn
        self.max_batch = max_batch
        self.mm = memory_manager or get_global_memory_manager()
        self.safety = safety

    def find_optimal_batch_size(self) -> int:
        best = 1
        b = 1
        while b <= self.max_batch:
            fn, args = self.make_jitted_fn(b)
            fits = self.mm.fits_on_device(fn, *args, safety=self.safety)
            if fits is None:
                # no memory analysis available: fall back to measuring
                fits = self._try_run(fn, args)
            if not fits:
                break
            best = b
            b *= 2
        logger.info("optimal batch size: %d", best)
        return best

    @staticmethod
    def _try_run(fn, args) -> bool:
        try:
            import jax
            out = fn(*args)
            jax.block_until_ready(out)
            return True
        except Exception as e:  # noqa: BLE001
            if "RESOURCE_EXHAUSTED" in str(e) or "Out of memory" in str(e):
                return False
            raise


class AdaptiveBatchProcessor:
    """Host-side chunked job processor with failure-halving
    (adaptive_batch_processor.py:30-364 API)."""

    def __init__(self, process_fn: Callable[[Sequence[Any]], Sequence[Any]],
                 initial_batch_size: int = 8, min_batch_size: int = 1,
                 max_batch_size: int = 64):
        self.process_fn = process_fn
        self.batch_size = initial_batch_size
        self.min_batch_size = min_batch_size
        self.max_batch_size = max_batch_size
        self.stats: Dict[str, float] = {
            "processed": 0, "failed": 0, "batches": 0, "total_time": 0.0}

    def process_batch(self, items: Sequence[Any]) -> List[Any]:
        """Process one chunk; on failure split in half recursively
        (adaptive_batch_processor.py:78-154 semantics without the CUDA
        cache dance)."""
        t0 = time.time()
        try:
            out = list(self.process_fn(items))
            self.stats["processed"] += len(items)
            self.stats["batches"] += 1
            self.stats["total_time"] += time.time() - t0
            # success at this size → gently grow toward max
            if self.batch_size < self.max_batch_size:
                self.batch_size = min(self.batch_size + 1,
                                      self.max_batch_size)
            return out
        except Exception as e:  # noqa: BLE001
            if len(items) <= self.min_batch_size:
                logger.error("item failed at min batch size: %s", e)
                self.stats["failed"] += len(items)
                return []
            logger.warning("batch of %d failed (%s); halving", len(items), e)
            self.batch_size = max(self.batch_size // 2, self.min_batch_size)
            mid = len(items) // 2
            return (self.process_batch(items[:mid]) +
                    self.process_batch(items[mid:]))

    def process_all(self, items: Sequence[Any]) -> List[Any]:
        out: List[Any] = []
        i = 0
        while i < len(items):
            chunk = items[i:i + self.batch_size]
            out.extend(self.process_batch(chunk))
            i += len(chunk)
        return out

    def get_statistics(self) -> Dict[str, float]:
        s = dict(self.stats)
        if s["batches"]:
            s["avg_batch_time"] = s["total_time"] / s["batches"]
        s["current_batch_size"] = self.batch_size
        return s


def pad_to_bucket(n: int, buckets: Sequence[int]) -> int:
    """Smallest bucket >= n (static-shape bucketing for ragged workloads)."""
    for b in sorted(buckets):
        if n <= b:
            return b
    return max(buckets)


def make_buckets(max_batch: int) -> List[int]:
    """Power-of-two bucket ladder up to max_batch."""
    out = [1]
    while out[-1] < max_batch:
        out.append(min(out[-1] * 2, max_batch))
    return sorted(set(out))
