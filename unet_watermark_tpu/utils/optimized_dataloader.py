"""Dataset caching + loader benchmarking — analog of
/root/reference/src/utils/optimized_dataloader.py.

The reference's thread-prefetch queue and async transform pool (:127-310)
are subsumed by data/pipeline.py (double-buffered device feed); what
remains useful here is the LRU dataset cache (:45-125), auto-tuned loader
parameters (:364-398) and the benchmark harness (:473-509).
"""
from __future__ import annotations

import collections
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


class OptimizedDataset:
    """LRU-cached wrapper around an index-addressable dataset
    (optimized_dataloader.py:45-125 analog)."""

    def __init__(self, dataset, cache_size: int = 512):
        self.dataset = dataset
        self.cache_size = cache_size
        self._cache: "collections.OrderedDict" = collections.OrderedDict()
        self.hits = 0
        self.misses = 0

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        if idx in self._cache:
            self.hits += 1
            self._cache.move_to_end(idx)
            return self._cache[idx]
        self.misses += 1
        item = self.dataset[idx]
        self._cache[idx] = item
        if len(self._cache) > self.cache_size:
            self._cache.popitem(last=False)
        return item

    def cache_stats(self) -> Dict[str, float]:
        total = self.hits + self.misses
        return {"hits": self.hits, "misses": self.misses,
                "hit_rate": self.hits / total if total else 0.0,
                "cached": len(self._cache)}


def auto_tune_loader_params(sample_bytes: int, batch_size: int
                            ) -> Dict[str, int]:
    """optimized_dataloader.py:364-398 analog."""
    from .memory import get_global_memory_manager

    return get_global_memory_manager().optimize_dataloader_params(
        sample_bytes, batch_size)


def benchmark_pipeline(pipeline, max_batches: Optional[int] = 20
                       ) -> Dict[str, float]:
    """Measure host pipeline throughput (optimized_dataloader.py:473-509
    analog); counts real (valid) samples per second."""
    import numpy as np

    t0 = time.time()
    batches = 0
    samples = 0.0
    for batch in pipeline:
        samples += float(np.asarray(batch["valid"]).sum()) \
            if "valid" in batch else len(next(iter(batch.values())))
        batches += 1
        if max_batches and batches >= max_batches:
            break
    dt = time.time() - t0
    stats = {"batches": batches, "samples": samples, "seconds": dt,
             "samples_per_second": samples / dt if dt > 0 else 0.0}
    logger.info("pipeline benchmark: %.1f samples/s",
                stats["samples_per_second"])
    return stats
