"""Profiling: timer context + rolling monitor + XLA trace capture.

Analog of /root/reference/src/utils/profiler.py (timer CM at :12,
PerformanceMonitor at :20) with the TPU tier added: `xla_trace` wraps
jax.profiler so a block's device execution lands in a TensorBoard-readable
xplane trace (SURVEY.md §5 "tracing": jax.profiler traces + per-step
timing).
"""
from __future__ import annotations

import collections
import contextlib
import logging
import time
from typing import Dict, Optional

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def timer(name: str = "block", sync: bool = True, log: bool = True):
    """Wall-clock timer; with sync=True blocks on outstanding device work
    so the measurement covers async dispatches."""
    start = time.perf_counter()
    result = {"name": name, "seconds": None}
    try:
        yield result
    finally:
        if sync:
            try:
                import jax
                jax.effects_barrier()
            except Exception:  # noqa: BLE001
                pass
        result["seconds"] = time.perf_counter() - start
        if log:
            logger.info("%s: %.4fs", name, result["seconds"])


class PerformanceMonitor:
    """Rolling per-op statistics (profiler.py:20-43 analog)."""

    def __init__(self, window: int = 100):
        self.window = window
        self._samples: Dict[str, collections.deque] = {}

    def record(self, name: str, seconds: float) -> None:
        self._samples.setdefault(
            name, collections.deque(maxlen=self.window)).append(seconds)

    @contextlib.contextmanager
    def track(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.record(name, time.perf_counter() - t0)

    def stats(self, name: str) -> Optional[Dict[str, float]]:
        s = self._samples.get(name)
        if not s:
            return None
        vals = sorted(s)
        n = len(vals)
        return {
            "count": n,
            "mean": sum(vals) / n,
            "min": vals[0],
            "max": vals[-1],
            "p50": vals[n // 2],
            "p95": vals[min(int(n * 0.95), n - 1)],
            "p99": vals[min(int(n * 0.99), n - 1)],
        }

    def all_stats(self) -> Dict[str, Dict[str, float]]:
        return {k: self.stats(k) for k in self._samples}


@contextlib.contextmanager
def xla_trace(log_dir: str = "/tmp/jax_trace"):
    """Capture an XLA/TPU profiler trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("trace written to %s", log_dir)


def annotate(name: str):
    """Named region that shows up inside device traces."""
    import jax

    return jax.profiler.TraceAnnotation(name)
