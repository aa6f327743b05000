#!/usr/bin/env python
"""Worked optimization-runtime examples — analog of
/root/reference/examples/optimization_example.py (:53-398, 7 examples).

Run: python examples/optimization_example.py [--example N]
All examples are self-contained (synthetic data, CPU-or-TPU agnostic).
"""
from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def example_1_basic():
    """Basic: global manager + context."""
    from unet_watermark_tpu.utils import get_global_optimization_manager

    om = get_global_optimization_manager()
    with om.optimization_context("example_1"):
        time.sleep(0.05)
    print("recommendations:", om.get_recommendations()[:2])


def example_2_custom_config():
    """Custom optimization config + validation + diff."""
    from unet_watermark_tpu.utils import ConfigManager, OptimizationConfig

    cfg = OptimizationConfig.aggressive()
    cfg.batch.max_batch_size = 128
    print("valid:", cfg.validate() == [])
    print("diff vs balanced:",
          list(ConfigManager.diff(OptimizationConfig.balanced(), cfg))[:4])


def example_3_dataloader():
    """LRU dataset cache + pipeline benchmark."""
    from unet_watermark_tpu.utils import OptimizedDataset, benchmark_pipeline

    class SlowDS:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            time.sleep(0.001)
            return np.zeros((8, 8, 3), np.uint8), np.zeros((8, 8), np.uint8)

    ds = OptimizedDataset(SlowDS(), cache_size=64)
    for i in range(64):
        ds[i]
    for i in range(64):
        ds[i]  # cached
    print("cache stats:", ds.cache_stats())


def example_4_memory():
    """Memory snapshots + compiled-memory planning."""
    import jax
    import jax.numpy as jnp

    from unet_watermark_tpu.utils import get_global_memory_manager

    mm = get_global_memory_manager()
    print("pressure:", mm.check_memory_pressure())
    f = jax.jit(lambda x: x @ x.T)
    n = mm.compiled_memory_bytes(f, jnp.zeros((256, 256)))
    print("compiled memory bytes:", n)


def example_5_profiling():
    """Per-op profiling with percentile stats."""
    from unet_watermark_tpu.utils import PerformanceAnalyzer

    pa = PerformanceAnalyzer()

    @pa.performance_profile("hot_op")
    def hot():
        time.sleep(0.003)

    for _ in range(20):
        hot()
    print("hot_op stats:", pa.profiler.stats("hot_op"))


def example_6_training():
    """Alternative trainer with warmup + grad accumulation."""
    import jax.numpy as jnp
    from flax import linen as nn

    from unet_watermark_tpu.utils import TrainingConfig, TrainingOptimizer

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(1, (1, 1))(x)

    cfg = TrainingConfig(learning_rate=0.05, warmup_steps=5,
                         gradient_accumulation_steps=2,
                         output_dir=tempfile.mkdtemp())
    topt = TrainingOptimizer(Tiny(),
                             lambda o, t: jnp.mean((o - t) ** 2), cfg)
    x = jnp.asarray(np.random.default_rng(0).random((4, 8, 8, 3)),
                    jnp.float32)

    def batches():
        yield {"image": x, "mask": x[..., :1] * 2}

    result = topt.train(batches, epochs=8)
    print("loss curve:", [round(v, 4)
                          for v in result["history"]["train_loss"]])


def example_7_comprehensive():
    """Config → optimized framework config → batch planning."""
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.utils import (
        OptimizationConfig,
        OptimizationManager,
    )

    om = OptimizationManager(OptimizationConfig.balanced())
    cfg = om.optimize_model_config(get_cfg_defaults())
    print("dtype:", cfg.MODEL.DTYPE, "| batch:", cfg.TRAIN.BATCH_SIZE,
          "| workers:", cfg.DATA.NUM_WORKERS)
    om.shutdown()


EXAMPLES = [example_1_basic, example_2_custom_config, example_3_dataloader,
            example_4_memory, example_5_profiling, example_6_training,
            example_7_comprehensive]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--example", type=int, default=0,
                   help="1-7, or 0 for all")
    args = p.parse_args()
    todo = EXAMPLES if args.example == 0 else [EXAMPLES[args.example - 1]]
    for fn in todo:
        print(f"\n=== {fn.__name__} ===")
        fn()


if __name__ == "__main__":
    main()
