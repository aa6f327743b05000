"""Optimization manager facade — analog of
/root/reference/src/utils/optimization_manager.py.

Wires the memory manager, batch planner, profiler and system monitor
behind one object (optimization_manager.py:41-525): applies process-level
settings (persistent compile cache instead of TF32/alloc-conf at
:154-183), transforms models for execution (bf16 + remat + donation
instead of nn.DataParallel at :205-260 — multi-device runs through the
mesh, not module wrappers), exposes the `optimization_context` profiling
CM (:349-385) and the recommendation/report surface, plus the global
singleton accessor (:527).
"""
from __future__ import annotations

import contextlib
import logging
import os
import threading
from typing import Any, Callable, Dict, List, Optional

from .batching import AdaptiveBatchProcessor, BatchSizeOptimizer
from .memory import TPUMemoryManager, get_global_memory_manager
from .optimization_config import OptimizationConfig
from .performance_analyzer import PerformanceAnalyzer

logger = logging.getLogger(__name__)


class OptimizationManager:
    def __init__(self, config: Optional[OptimizationConfig] = None):
        self.config = config or OptimizationConfig.auto_detect()
        self._lock = threading.Lock()
        self.memory_manager = TPUMemoryManager(
            warning_threshold=self.config.memory.warning_threshold,
            critical_threshold=self.config.memory.critical_threshold,
            monitor_interval=self.config.memory.monitor_interval)
        self.analyzer = PerformanceAnalyzer(
            monitor_interval=self.config.monitoring.monitor_interval)
        self._applied_global = False

    # ---- global process settings (:154-183 analog) -------------------------
    def apply_global_settings(self) -> None:
        with self._lock:
            if self._applied_global:
                return
            if self.config.model.persistent_compile_cache:
                try:
                    import jax
                    cache = self.config.model.compile_cache_dir or \
                        os.path.join(os.path.expanduser("~"), ".cache",
                                     "unet_watermark_tpu", "jax")
                    os.makedirs(cache, exist_ok=True)
                    jax.config.update("jax_compilation_cache_dir", cache)
                    jax.config.update(
                        "jax_persistent_cache_min_compile_time_secs", 1.0)
                except Exception as e:  # noqa: BLE001
                    logger.debug("compile cache setup failed: %s", e)
            if self.config.memory.enable_monitoring:
                self.memory_manager.start_monitoring()
            if self.config.monitoring.system_monitor:
                self.analyzer.start()
            self._applied_global = True

    # ---- model-level settings (:205-260 analog) ----------------------------
    def optimize_model_config(self, cfg) -> Any:
        """Apply optimization policy onto a framework Config (bf16, remat,
        donation, dataloader tuning). The multi-GPU DataParallel branch of
        the reference maps to mesh parallelism, which is always on."""
        cfg = cfg.clone()
        cfg.MODEL.DTYPE = self.config.model.compute_dtype
        cfg.MODEL.REMAT = self.config.memory.remat
        cfg.TRAIN.DONATE_STATE = self.config.model.donate_buffers
        cfg.TRAIN.GRADIENT_CLIP = self.config.training.gradient_clip
        cfg.TRAIN.STEPS_PER_EXEC = self.config.training.steps_per_execution
        cfg.DATA.NUM_WORKERS = self.config.dataloader.num_workers
        cfg.DATA.PREFETCH_FACTOR = self.config.dataloader.prefetch_factor
        cfg.DATA.CACHE_IMAGES = self.config.dataloader.cache_images
        cfg.TRAIN.BATCH_SIZE = self.config.batch.initial_batch_size
        return cfg

    # ---- factories (:262-347 analog) ---------------------------------------
    def create_batch_processor(self, process_fn: Callable
                               ) -> AdaptiveBatchProcessor:
        return AdaptiveBatchProcessor(
            process_fn,
            initial_batch_size=self.config.batch.initial_batch_size,
            max_batch_size=self.config.batch.max_batch_size)

    def create_batch_size_optimizer(self, make_jitted_fn
                                    ) -> BatchSizeOptimizer:
        return BatchSizeOptimizer(
            make_jitted_fn, max_batch=self.config.batch.max_batch_size,
            memory_manager=self.memory_manager)

    # ---- context (:349-385) -------------------------------------------------
    @contextlib.contextmanager
    def optimization_context(self, name: str = "block"):
        self.apply_global_settings()
        with self.analyzer.profiler.track(name):
            level = self.memory_manager.check_memory_pressure()
            if level == "critical":
                self.memory_manager.cleanup()
            yield self

    # ---- reporting ----------------------------------------------------------
    def get_recommendations(self) -> List[str]:
        return self.analyzer.recommendations()

    def generate_report(self, output_dir: str = "optimization_report"
                        ) -> Dict[str, str]:
        return self.analyzer.export_report(output_dir)

    def shutdown(self) -> None:
        self.memory_manager.stop_monitoring()
        self.analyzer.stop()


_GLOBAL: Optional[OptimizationManager] = None


def get_global_optimization_manager(
        config: Optional[OptimizationConfig] = None) -> OptimizationManager:
    """optimization_manager.py:527 analog."""
    global _GLOBAL
    if _GLOBAL is None:
        _GLOBAL = OptimizationManager(config)
    return _GLOBAL
