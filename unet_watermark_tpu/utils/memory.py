"""Memory management — TPU analog of the reference's GPU memory stack.

Replaces enhanced_memory_manager.py (:32-352) and cuda_monitor.py (:31-277).
Most of the reference machinery (empty_cache loops, OOM catch-and-retry)
dissolves under XLA: device memory is planned at compile time, so the
job here is *ahead-of-time* estimation and monitoring rather than runtime
firefighting:

  * snapshots of host RAM (psutil) and per-device HBM (jax memory_stats)
  * pressure thresholds + optional background monitor thread with
    callbacks (enhanced_memory_manager.py:97-158 contract)
  * `fits_on_device` / `max_batch_size_for` — static planning from
    compiled-memory analysis, replacing the OOM halve-and-retry loop
  * `memory_context` CM and the global singleton accessor
"""
from __future__ import annotations

import dataclasses
import gc
import logging
import threading
import time
from typing import Callable, Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class MemorySnapshot:
    timestamp: float
    host_total: int
    host_used: int
    host_percent: float
    device_bytes_in_use: int
    device_bytes_limit: int

    @property
    def device_percent(self) -> float:
        if self.device_bytes_limit <= 0:
            return 0.0
        return 100.0 * self.device_bytes_in_use / self.device_bytes_limit


class TPUMemoryManager:
    """enhanced_memory_manager.py:32-352 analog."""

    def __init__(self, warning_threshold: float = 80.0,
                 critical_threshold: float = 92.0,
                 monitor_interval: float = 5.0):
        self.warning_threshold = warning_threshold
        self.critical_threshold = critical_threshold
        self.monitor_interval = monitor_interval
        self.history: List[MemorySnapshot] = []
        self._callbacks: List[Callable[[MemorySnapshot, str], None]] = []
        self._thread: Optional[threading.Thread] = None
        self._stop = threading.Event()

    # ---- snapshots -------------------------------------------------------
    def snapshot(self) -> MemorySnapshot:
        import psutil

        vm = psutil.virtual_memory()
        in_use = limit = 0
        try:
            import jax
            for d in jax.local_devices():
                stats = d.memory_stats() or {}
                in_use += stats.get("bytes_in_use", 0)
                limit += stats.get("bytes_limit", 0)
        except Exception as e:  # noqa: BLE001
            logger.debug("device memory stats unavailable: %s", e)
        snap = MemorySnapshot(
            timestamp=time.time(), host_total=vm.total, host_used=vm.used,
            host_percent=vm.percent, device_bytes_in_use=in_use,
            device_bytes_limit=limit)
        self.history.append(snap)
        if len(self.history) > 1000:
            self.history = self.history[-500:]
        return snap

    def check_memory_pressure(self) -> str:
        """'ok' | 'warning' | 'critical' (enhanced_memory_manager.py:97)."""
        snap = self.snapshot()
        level = "ok"
        worst = max(snap.host_percent, snap.device_percent)
        if worst >= self.critical_threshold:
            level = "critical"
        elif worst >= self.warning_threshold:
            level = "warning"
        if level != "ok":
            for cb in self._callbacks:
                cb(snap, level)
        return level

    def cleanup(self) -> None:
        """Host-side cleanup. There is no TPU empty_cache: XLA buffers are
        freed when their jax.Arrays die; clearing jitted-program caches is
        the only reclaimable pool (and costs recompiles — critical only)."""
        gc.collect()

    def aggressive_cleanup(self) -> None:
        gc.collect()
        try:
            import jax
            jax.clear_caches()
            logger.warning("cleared jax compilation caches (memory "
                           "pressure); subsequent steps will recompile")
        except Exception:  # noqa: BLE001
            pass

    # ---- static planning (replaces adaptive_batch OOM retry) -------------
    @staticmethod
    def compiled_memory_bytes(jitted_fn, *example_args) -> Optional[int]:
        """Ask XLA for the compiled program's memory plan — exact, ahead
        of time (no reference counterpart possible on torch/CUDA)."""
        try:
            lowered = jitted_fn.lower(*example_args)
            compiled = lowered.compile()
            analysis = compiled.memory_analysis()
            if analysis is None:
                return None
            return int(analysis.temp_size_in_bytes +
                       analysis.argument_size_in_bytes +
                       analysis.output_size_in_bytes +
                       analysis.generated_code_size_in_bytes)
        except Exception as e:  # noqa: BLE001
            logger.debug("memory analysis failed: %s", e)
            return None

    def fits_on_device(self, jitted_fn, *example_args,
                       safety: float = 0.9) -> Optional[bool]:
        need = self.compiled_memory_bytes(jitted_fn, *example_args)
        if need is None:
            return None
        snap = self.snapshot()
        if snap.device_bytes_limit <= 0:
            return None
        return need <= snap.device_bytes_limit * safety

    # ---- monitor thread --------------------------------------------------
    def add_callback(self, cb: Callable[[MemorySnapshot, str], None]):
        self._callbacks.append(cb)

    def start_monitoring(self) -> None:
        if self._thread is not None:
            return
        self._stop.clear()

        def loop():
            while not self._stop.wait(self.monitor_interval):
                try:
                    self.check_memory_pressure()
                except Exception as e:  # noqa: BLE001
                    logger.debug("monitor error: %s", e)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop_monitoring(self) -> None:
        if self._thread is None:
            return
        self._stop.set()
        self._thread.join(timeout=2)
        self._thread = None

    # ---- dataloader advice (enhanced_memory_manager.py:278) ---------------
    def optimize_dataloader_params(self, sample_bytes: int,
                                   batch_size: int) -> Dict[str, int]:
        import psutil

        avail = psutil.virtual_memory().available
        per_batch = sample_bytes * batch_size
        prefetch = max(1, min(8, int(avail * 0.2 / max(per_batch, 1))))
        workers = max(1, min(16, psutil.cpu_count(logical=False) or 4))
        return {"num_workers": workers, "prefetch_factor": prefetch}


class memory_context:
    """CM: snapshot before/after, log delta
    (enhanced_memory_manager.py:260-276)."""

    def __init__(self, manager: Optional[TPUMemoryManager] = None,
                 name: str = "block"):
        self.manager = manager or get_global_memory_manager()
        self.name = name

    def __enter__(self):
        self.before = self.manager.snapshot()
        return self.manager

    def __exit__(self, *exc):
        after = self.manager.snapshot()
        logger.info(
            "%s: device %.1f%%→%.1f%%, host %.1f%%→%.1f%%", self.name,
            self.before.device_percent, after.device_percent,
            self.before.host_percent, after.host_percent)
        return False


_GLOBAL: Optional[TPUMemoryManager] = None


def get_global_memory_manager() -> TPUMemoryManager:
    """enhanced_memory_manager.py:311 analog."""
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = TPUMemoryManager()
    return _GLOBAL


def log_memory_usage(prefix: str = "") -> MemorySnapshot:
    """One-shot usage line (cuda_monitor.py:247-260 analog): device HBM
    and host RAM percentages at INFO, plus the pressure level when it is
    above 'ok'. Returns the snapshot for programmatic use."""
    mgr = get_global_memory_manager()
    snap = mgr.snapshot()
    level = mgr.check_memory_pressure()
    logger.info(
        "%smemory: device %.2f/%.2f GB (%.1f%%), host %.1f%%%s",
        f"{prefix} " if prefix else "",
        snap.device_bytes_in_use / 1024**3,
        snap.device_bytes_limit / 1024**3, snap.device_percent,
        snap.host_percent, f" [{level}]" if level != "ok" else "")
    return snap
