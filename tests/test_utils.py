"""Optimization-runtime suite tests (components 20-30 of SURVEY.md §2.3)."""
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.utils import (
    AdaptiveBatchProcessor,
    BatchSizeOptimizer,
    ConfigManager,
    OptimizationConfig,
    OptimizationManager,
    OptimizedDataset,
    OptimizedPredictor,
    PerformanceAnalyzer,
    PerformanceMonitor,
    TPUMemoryManager,
    TrainingConfig,
    benchmark_pipeline,
    build_optimizer,
    build_schedule,
    compare_models,
    get_global_memory_manager,
    list_checkpoints,
    make_buckets,
    memory_context,
    pad_to_bucket,
    timer,
)


def test_timer_and_monitor():
    mon = PerformanceMonitor()
    with timer("t", log=False) as r:
        with mon.track("op"):
            time.sleep(0.01)
    assert r["seconds"] >= 0.01
    st = mon.stats("op")
    assert st["count"] == 1 and st["p50"] >= 0.01


def test_memory_manager_snapshot_and_pressure():
    mm = TPUMemoryManager()
    snap = mm.snapshot()
    assert snap.host_total > 0
    assert mm.check_memory_pressure() in ("ok", "warning", "critical")
    with memory_context(mm, "x"):
        pass
    assert get_global_memory_manager() is get_global_memory_manager()


def test_log_memory_usage(caplog):
    import logging

    from unet_watermark_tpu.utils.memory import log_memory_usage

    with caplog.at_level(logging.INFO,
                         logger="unet_watermark_tpu.utils.memory"):
        snap = log_memory_usage("unit")
    assert snap.host_total > 0
    assert any("unit memory:" in r.message for r in caplog.records)


def test_compiled_memory_bytes():
    f = jax.jit(lambda x: x * 2 + 1)
    x = jnp.zeros((128, 128))
    n = TPUMemoryManager.compiled_memory_bytes(f, x)
    # CPU backend may or may not expose analysis; if present it's positive
    if n is not None:
        assert n > 0


def test_batch_size_optimizer():
    def make(b):
        f = jax.jit(lambda x: jnp.sum(x))
        return f, (jnp.zeros((b, 8, 8)),)

    opt = BatchSizeOptimizer(make, max_batch=16)
    b = opt.find_optimal_batch_size()
    assert b >= 1


def test_adaptive_batch_processor_halves_on_failure():
    calls = []

    def process(items):
        calls.append(len(items))
        if len(items) > 2:
            raise RuntimeError("too big")
        return [i * 2 for i in items]

    p = AdaptiveBatchProcessor(process, initial_batch_size=8)
    out = p.process_all(list(range(10)))
    assert sorted(out) == [i * 2 for i in range(10)]
    stats = p.get_statistics()
    assert stats["processed"] == 10


def test_buckets():
    assert make_buckets(32) == [1, 2, 4, 8, 16, 32]
    assert pad_to_bucket(5, [1, 2, 4, 8]) == 8
    assert pad_to_bucket(100, [1, 2, 4, 8]) == 8


def test_optimization_config_presets_and_roundtrip(tmp_path):
    for level in ("conservative", "balanced", "aggressive"):
        cfg = OptimizationConfig.from_level(level)
        assert cfg.validate() == []
    a = OptimizationConfig.aggressive()
    p = str(tmp_path / "opt.yaml")
    a.save(p)
    b = OptimizationConfig.load(p)
    assert b.batch.max_batch_size == a.batch.max_batch_size
    assert b.level == a.level
    cm = ConfigManager(str(tmp_path / "presets"))
    cm.save_preset("agg", a)
    assert "agg" in cm.list_presets()
    d = ConfigManager.diff(OptimizationConfig.balanced(), a)
    assert any("batch" in k for k in d)


def test_optimization_config_autodetect():
    cfg = OptimizationConfig.auto_detect()
    assert cfg.validate() == []


def test_optimization_manager_facade(tmp_path):
    from unet_watermark_tpu.configs import get_cfg_defaults

    om = OptimizationManager(OptimizationConfig.balanced())
    cfg = om.optimize_model_config(get_cfg_defaults())
    assert cfg.MODEL.DTYPE == "bfloat16"
    with om.optimization_context("work"):
        time.sleep(0.01)
    recs = om.get_recommendations()
    assert isinstance(recs, list) and recs
    paths = om.generate_report(str(tmp_path / "report"))
    assert os.path.exists(paths["json"])
    assert os.path.exists(paths["markdown"])
    om.shutdown()


def test_performance_analyzer_profile_decorator(tmp_path):
    pa = PerformanceAnalyzer()

    @pa.performance_profile("myop")
    def work():
        time.sleep(0.005)

    for _ in range(3):
        work()
    st = pa.profiler.stats("myop")
    assert st["count"] == 3
    pa.monitor.sample()
    recs = pa.recommendations()
    assert recs


def test_optimized_dataset_lru():
    class DS:
        def __len__(self):
            return 10

        def __getitem__(self, i):
            return i * i

    ds = OptimizedDataset(DS(), cache_size=3)
    for i in [0, 1, 2, 0, 1, 3, 0]:
        ds[i]
    st = ds.cache_stats()
    assert st["hits"] >= 2
    assert st["cached"] <= 3


def test_optimized_predictor_pads_remainder():
    p = OptimizedPredictor(lambda x: x * 2.0, batch_size=4)
    out = p.predict([np.full((2, 2), float(i)) for i in range(6)])
    assert len(out) == 6
    np.testing.assert_allclose(out[5], np.full((2, 2), 10.0))
    st = p.get_statistics()
    assert st["batch_size"] == 4


def test_benchmark_pipeline():
    batches = [{"image": np.zeros((4, 2, 2, 3)),
                "valid": np.ones((4,))} for _ in range(3)]
    stats = benchmark_pipeline(iter(batches))
    assert stats["samples"] == 12


def test_training_optimizer_schedules():
    cfg = TrainingConfig(learning_rate=0.1, warmup_steps=10,
                         total_steps=100, scheduler="cosine")
    sched = build_schedule(cfg)
    assert float(sched(0)) == pytest.approx(0.0)
    assert float(sched(10)) == pytest.approx(0.1, rel=1e-5)
    assert float(sched(99)) < 0.1
    tx = build_optimizer(cfg)
    assert tx is not None
    # grad accumulation wrapper
    cfg2 = TrainingConfig(gradient_accumulation_steps=4)
    tx2 = build_optimizer(cfg2)
    params = {"w": jnp.ones(3)}
    state = tx2.init(params)
    g = {"w": jnp.ones(3)}
    new_params = params
    for _ in range(4):
        updates, state = tx2.update(g, state, new_params)
        new_params = jax.tree_util.tree_map(lambda p, u: p + u, new_params,
                                            updates)
    # after 4 micro-steps exactly one real update happened
    assert not np.allclose(np.asarray(new_params["w"]), 1.0)


def test_training_optimizer_trains():
    from flax import linen as nn

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(1, (1, 1), name="c")(x)

    def loss_fn(out, target):
        return jnp.mean((out - target) ** 2)

    cfg = TrainingConfig(learning_rate=0.05, scheduler="none",
                         output_dir="/tmp/topt_test", total_steps=100,
                         gradient_clip=0.0)
    topt = TrainingOptimizer = None  # avoid flake confusion
    from unet_watermark_tpu.utils import TrainingOptimizer as TO

    topt = TO(Tiny(), loss_fn, cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((8, 8, 8, 3)), jnp.float32)
    y = jnp.asarray(x[..., :1] * 2.0)

    def batches():
        yield {"image": x, "mask": y}

    result = topt.train(batches, epochs=12, val_batches_fn=batches)
    h = result["history"]["train_loss"]
    assert h[-1] < h[0]
    assert os.path.exists("/tmp/topt_test/training_history.json")


def test_model_manager_lists_and_compares(tmp_path, capsys):
    import torch

    torch.save({"model_state_dict": {}, "epoch": 5, "best_val_loss": 0.1,
                "val_metrics": {"iou": 0.8, "f1": 0.9}},
               str(tmp_path / "a.pth"))
    os.makedirs(tmp_path / "ck" )
    meta = {"epoch": 2, "history": {"val_loss": [0.5, 0.4],
                                    "val_iou": [0.1, 0.2],
                                    "val_f1": [0.2, 0.3]}}
    os.makedirs(tmp_path / "ckpt_dir")
    with open(tmp_path / "ckpt_dir" / "meta.json", "w") as f:
        json.dump(meta, f)
    rows = list_checkpoints(str(tmp_path))
    kinds = {r["kind"] for r in rows}
    assert "pth" in kinds and "orbax" in kinds
    rows2 = compare_models(str(tmp_path))
    out = capsys.readouterr().out
    assert "a.pth" in out
    assert len(rows2) == len(rows)
