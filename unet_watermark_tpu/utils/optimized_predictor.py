"""Generic batched inference wrapper — analog of
/root/reference/src/utils/optimized_predictor.py.

Wraps ANY jittable model fn with the serving conveniences the reference
builds around torch inference (:55-518): fixed-shape batching with padding
(instead of adaptive OOM retry), pre/post-processing hooks, optional
ahead-of-time batch-size tuning, per-batch timing stats, and result
saving. The torch.compile / TensorRT stubs (:104-134) have no TPU
equivalent needed — jit IS the compile path.
"""
from __future__ import annotations

import logging
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence

import jax
import numpy as np

from .batching import BatchSizeOptimizer
from .profiler import PerformanceMonitor

logger = logging.getLogger(__name__)


class OptimizedPredictor:
    def __init__(self, forward_fn: Callable,
                 batch_size: int = 8,
                 preprocess: Optional[Callable[[Any], np.ndarray]] = None,
                 postprocess: Optional[Callable[[np.ndarray], Any]] = None,
                 auto_tune_batch: bool = False,
                 example_input: Optional[np.ndarray] = None,
                 max_batch_size: int = 128):
        """forward_fn: (N, ...) device array → (N, ...) output."""
        self.forward = jax.jit(forward_fn)
        self.batch_size = batch_size
        self.preprocess = preprocess or (lambda x: np.asarray(x))
        self.postprocess = postprocess or (lambda x: x)
        self.monitor = PerformanceMonitor()
        if auto_tune_batch and example_input is not None:
            self.batch_size = self._tune(example_input, max_batch_size)

    def _tune(self, example: np.ndarray, max_batch: int) -> int:
        def make(b):
            batch = np.broadcast_to(example[None], (b,) + example.shape)
            return self.forward, (jax.numpy.asarray(batch),)

        opt = BatchSizeOptimizer(make, max_batch=max_batch)
        return opt.find_optimal_batch_size()

    def predict(self, items: Sequence[Any]) -> List[Any]:
        """Batched prediction with static-shape padding on the remainder."""
        outputs: List[Any] = []
        bs = self.batch_size
        for i in range(0, len(items), bs):
            chunk = [self.preprocess(x) for x in items[i:i + bs]]
            n = len(chunk)
            arr = np.stack(chunk)
            if n < bs:
                pad = np.zeros((bs - n,) + arr.shape[1:], arr.dtype)
                arr = np.concatenate([arr, pad])
            with self.monitor.track("batch"):
                out = np.asarray(self.forward(jax.numpy.asarray(arr)))
            outputs.extend(self.postprocess(o) for o in out[:n])
        return outputs

    def predict_and_save(self, items: Sequence[Any], output_dir: str,
                         names: Optional[Sequence[str]] = None,
                         saver: Optional[Callable] = None) -> List[str]:
        os.makedirs(output_dir, exist_ok=True)
        results = self.predict(items)
        paths = []
        for i, r in enumerate(results):
            name = names[i] if names else f"result_{i:06d}.npy"
            path = os.path.join(output_dir, name)
            if saver:
                saver(path, r)
            else:
                np.save(path, np.asarray(r))
            paths.append(path)
        return paths

    def get_statistics(self) -> Dict:
        st = self.monitor.stats("batch") or {}
        if st:
            st["images_per_second"] = self.batch_size / st["mean"]
        st["batch_size"] = self.batch_size
        return st
