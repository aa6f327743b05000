import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.data.gen_data import generate_dataset
from unet_watermark_tpu.training import (
    EarlyStopping,
    LRScheduler,
    create_train_state,
    make_eval_step,
    make_train_step,
    restore_checkpoint,
    save_checkpoint,
    train,
)
from unet_watermark_tpu.ops import losses as losses_lib


def small_cfg(tmp, img=64):
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = img
    cfg.DATA.NUM_WORKERS = 2
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.CHECKPOINT_DIR = os.path.join(tmp, "ckpts")
    cfg.TRAIN.OUTPUT_DIR = os.path.join(tmp, "out")
    cfg.TRAIN.MODEL_SAVE_PATH = os.path.join(tmp, "model.pth")
    cfg.TRAIN.SAVE_INTERVAL = 1
    cfg.LOSS.NAME = "CombinedLoss"
    return cfg


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    clean = tmp_path_factory.mktemp("clean")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.random((96, 96, 3)) * 200).astype(np.uint8)
        Image.fromarray(arr).save(clean / f"c{i}.jpg", quality=95)
    root = tmp_path_factory.mktemp("root")
    generate_dataset(str(clean), str(root), logos_dir=None, count=16, seed=3)
    return str(root)


def _synthetic_batch(n=8, img=64, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.random((n, img, img, 3)).astype(np.float32)
    masks = np.zeros((n, img, img, 1), np.float32)
    masks[:, 16:48, 16:48] = 1.0
    images[:, 16:48, 16:48] = np.clip(
        images[:, 16:48, 16:48] + 0.4, 0, 1)  # learnable signal
    return {"image": jnp.asarray(images), "mask": jnp.asarray(masks),
            "valid": jnp.ones((n,), jnp.float32)}


def test_train_step_decreases_loss(tmp_path):
    cfg = small_cfg(str(tmp_path))
    model, state = create_train_state(cfg)
    loss_fn = losses_lib.get_loss_function(cfg)
    step = make_train_step(model, loss_fn, "basic", donate=False)
    batch = _synthetic_batch()
    rng = jax.random.PRNGKey(0)
    losses = []
    for i in range(12):
        rng, sub = jax.random.split(rng)
        state, m = step(state, batch, sub)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_eval_step_valid_mask_excludes_padding(tmp_path):
    cfg = small_cfg(str(tmp_path))
    model, state = create_train_state(cfg)
    loss_fn = losses_lib.get_loss_function(cfg)
    estep = make_eval_step(model, loss_fn)
    full = _synthetic_batch(n=8)
    half = {k: v for k, v in full.items()}
    valid = np.ones((8,), np.float32)
    valid[4:] = 0.0
    half["valid"] = jnp.asarray(valid)
    m_full = estep(state, full)
    m_half = estep(state, half)
    # tp+fp+fn+tn must count only valid pixels
    total_half = sum(float(m_half[k]) for k in ("tp", "fp", "fn", "tn"))
    total_full = sum(float(m_full[k]) for k in ("tp", "fp", "fn", "tn"))
    assert total_half == pytest.approx(total_full / 2, rel=1e-5)


def test_lr_scheduler_plateau():
    cfg = get_cfg_defaults()
    cfg.TRAIN.LR = 0.1
    cfg.OPTIMIZER.SCHEDULER_PATIENCE = 1
    cfg.OPTIMIZER.SCHEDULER_FACTOR = 0.5
    s = LRScheduler(cfg)
    assert s.step(1.0) == 0.1   # improves (first)
    assert s.step(1.0) == 0.1   # bad 1
    assert s.step(1.0) == 0.05  # bad 2 > patience → decay
    assert s.step(0.5) == 0.05  # improvement resets


def test_lr_scheduler_cosine_restarts():
    cfg = get_cfg_defaults()
    cfg.TRAIN.LR = 0.1
    cfg.OPTIMIZER.LR_SCHEDULER = "CosineAnnealingWarmRestarts"
    cfg.OPTIMIZER.SCHEDULER_T_0 = 4
    cfg.OPTIMIZER.SCHEDULER_T_MULT = 2
    cfg.OPTIMIZER.SCHEDULER_ETA_MIN = 0.0
    s = LRScheduler(cfg)
    lrs = [s.step() for _ in range(8)]
    assert lrs[2] < lrs[0]      # decaying within the first period
    assert lrs[3] == pytest.approx(0.1)  # restart at epoch 4 (t_cur=0)
    assert lrs[4] < lrs[3]      # decaying again in the doubled period


def test_early_stopping():
    es = EarlyStopping(patience=2)
    assert not es(1.0)
    assert not es(0.9)
    assert not es(0.95)
    assert es(0.95)  # 2 bad epochs
    assert es.should_stop


def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg(str(tmp_path))
    model, state = create_train_state(cfg)
    loss_fn = losses_lib.get_loss_function(cfg)
    step = make_train_step(model, loss_fn, "basic", donate=False)
    rng = jax.random.PRNGKey(0)
    state, _ = step(state, _synthetic_batch(), rng)
    meta = {"epoch": 1, "best_val_loss": 0.5, "history": {"train_loss": [1.0]}}
    path = save_checkpoint(str(tmp_path / "ck"), "best_model", state, meta)
    _, fresh = create_train_state(cfg)
    restored, meta2 = restore_checkpoint(path, fresh)
    assert meta2["epoch"] == 1
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    assert int(restored.step) == int(state.step)


def test_slim_best_save_restores_params_with_fresh_optimizer(tmp_path):
    """Best-model saves are inference-grade (no opt_state — the
    reference's best file is likewise slimmer, train.py:428-435): the
    slim checkpoint must restore params/batch_stats exactly and fall
    back to a fresh optimizer state, and must not store Adam m/v."""
    from unet_watermark_tpu.utils.async_ckpt import slim_snapshot

    cfg = small_cfg(str(tmp_path))
    model, state = create_train_state(cfg)
    loss_fn = losses_lib.get_loss_function(cfg)
    step = make_train_step(model, loss_fn, "basic", donate=False)
    state, _ = step(state, _synthetic_batch(), jax.random.PRNGKey(0))

    snap = slim_snapshot(state)
    assert snap.opt_state is None
    path = save_checkpoint(str(tmp_path / "ck"), "best_model", snap,
                           {"epoch": 1, "best_val_loss": 0.5})
    from unet_watermark_tpu.training.checkpoint import restore_raw
    tree, _ = restore_raw(path)
    assert "opt_state" not in tree

    _, fresh = create_train_state(cfg)
    restored, meta = restore_checkpoint(path, fresh)
    assert meta["epoch"] == 1
    for x, y in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))
    # fresh optimizer state: Adam moments are zero
    mom = [leaf for leaf in jax.tree_util.tree_leaves(restored.opt_state)
           if hasattr(leaf, "shape") and getattr(leaf, "size", 0) > 1]
    assert mom and all(float(np.abs(np.asarray(m)).max()) == 0.0
                       for m in mom)


def test_end_to_end_train_on_files(data_root, tmp_path):
    """Minimum e2e slice (SURVEY.md §7.2): files → train() → checkpoint +
    history + .pth; val metrics populated; loss finite."""
    cfg = small_cfg(str(tmp_path))
    cfg.DATA.ROOT_DIR = data_root
    cfg.TRAIN.EPOCHS = 2
    result = train(cfg, max_steps_per_epoch=2)
    assert result["epochs_run"] == 2
    assert np.isfinite(result["history"]["train_loss"]).all()
    assert np.isfinite(result["history"]["val_loss"]).all()
    assert result["best_checkpoint"] is not None
    assert os.path.exists(os.path.join(cfg.TRAIN.OUTPUT_DIR,
                                       "training_history.json"))
    assert os.path.exists(cfg.TRAIN.MODEL_SAVE_PATH)  # .pth export


def test_resume_continues_epoch_count(data_root, tmp_path):
    cfg = small_cfg(str(tmp_path))
    cfg.DATA.ROOT_DIR = data_root
    cfg.TRAIN.EPOCHS = 1
    r1 = train(cfg, max_steps_per_epoch=1)
    cfg.TRAIN.EPOCHS = 2
    r2 = train(cfg, resume_from=r1["best_checkpoint"],
               max_steps_per_epoch=1)
    # resumed at epoch 1, ran 1 more → history has 2 entries
    assert r2["epochs_run"] == 2


def test_dp_equivalence_1_vs_8_devices(tmp_path):
    """Full train+eval cycle equivalence: the same data through a 1-device
    and an 8-device mesh must produce matching loss/metric trajectories and
    final parameters (catches sharding bugs per-op tests can't)."""
    from unet_watermark_tpu.parallel import make_mesh, replicated, shard_batch

    cfg = small_cfg(tmp_path)
    cfg.LOSS.NAME = "CombinedLoss"
    # SGD keeps the update linear in the gradient, so 1-vs-8-device
    # parameter differences stay at fp32 reduction-noise scale (Adam's
    # rsqrt(v) normalization amplifies sign flips of near-zero gradients
    # into O(lr) divergence, which would mask nothing but fail spuriously).
    cfg.OPTIMIZER.NAME = "SGD"
    model, state0 = create_train_state(cfg, seed=0)
    loss_fn = losses_lib.get_loss_function(cfg)
    step = make_train_step(model, loss_fn, "transparent_watermark",
                           donate=False)
    eval_step = make_eval_step(model, loss_fn)

    rng = np.random.default_rng(123)
    batches = []
    for _ in range(3):
        batches.append({
            "image": (rng.random((16, 64, 64, 3)) * 255).astype(np.uint8),
            "mask": (rng.random((16, 64, 64, 1)) > 0.7).astype(np.float32),
            "valid": np.ones((16,), np.float32),
        })

    def run(n_dev):
        mesh = make_mesh(devices=jax.devices()[:n_dev])
        rep = replicated(mesh)
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep) if hasattr(x, "shape") else x,
            state0)
        losses = []
        for i, b in enumerate(batches):
            state, metrics = step(state, shard_batch(b, mesh),
                                  jax.random.PRNGKey(7 + i))
            losses.append(float(metrics["loss"]))
        ev = eval_step(state, shard_batch(batches[0], mesh))
        return losses, {k: float(v) for k, v in ev.items()}, state

    losses1, eval1, state1 = run(1)
    losses8, eval8, state8 = run(8)

    np.testing.assert_allclose(losses1, losses8, rtol=2e-3, atol=1e-5)
    for k in eval1:
        # confusion counts (tp/fp/fn/tn) flip on pixels whose probability
        # sits within fp32 reduction-order noise of the threshold — with a
        # 3-step barely-trained model that's a lot of pixels, so counts get
        # a loose bound; loss (and params below) are the strict signal.
        rtol = 0.15 if k in ("tp", "fp", "fn", "tn") else 2e-3
        np.testing.assert_allclose(eval1[k], eval8[k], rtol=rtol, atol=1e-3,
                                   err_msg=f"eval metric {k}")
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)


def test_async_saver_orders_flushes_and_raises(tmp_path):
    import time

    from unet_watermark_tpu.utils.async_ckpt import AsyncSaver

    order = []

    def job(i, delay=0.0):
        time.sleep(delay)
        order.append(i)

    s = AsyncSaver(max_pending=2)
    for i in range(4):
        s.submit(job, i, 0.02)
    s.flush()
    assert order == [0, 1, 2, 3]  # FIFO on one worker

    def boom():
        raise RuntimeError("disk full")

    s.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        s.flush()
    s.close()


def test_snapshot_state_survives_donation(tmp_path):
    """A snapshot taken before a donating step stays readable after the
    live state's buffers are invalidated."""
    from unet_watermark_tpu.utils.async_ckpt import snapshot_state

    cfg = small_cfg(str(tmp_path))
    _, state = create_train_state(cfg, seed=0)
    loss_fn = losses_lib.get_loss_function(cfg)
    step = make_train_step(None, loss_fn, "transparent_watermark",
                           donate=True)
    batch = _synthetic_batch(img=64)
    key = jax.random.PRNGKey(0)
    state, _ = step(state, batch, key)
    snap = snapshot_state(state)
    state, _ = step(state, batch, key)  # donates the snapshotted state
    leaf = jax.tree_util.tree_leaves(snap.params)[0]
    assert np.isfinite(np.asarray(leaf)).all()


def test_train_writes_best_checkpoint_async(data_root, tmp_path):
    cfg = small_cfg(str(tmp_path))
    cfg.DATA.ROOT_DIR = data_root
    cfg.DATA.CACHE_DIR = str(tmp_path / "cache")
    cfg.TRAIN.EPOCHS = 1
    out = train(cfg)
    assert out["best_checkpoint"] is not None
    assert os.path.isdir(out["best_checkpoint"])  # flushed before return


def test_epoch_scan_trains_and_matches_perstep_metrics(data_root, tmp_path):
    """Whole-epoch lax.scan path (TRAIN.EPOCH_SCAN): one dispatch per
    epoch over the device-resident corpus. Must train (finite decreasing
    loss, state advances) and report the same metric keys; ranges agree
    with the per-step loop on the same data to training noise."""
    cfg = small_cfg(str(tmp_path))
    cfg.DATA.ROOT_DIR = data_root
    cfg.TRAIN.EPOCHS = 2
    cfg.TRAIN.LOG_INTERVAL = 0       # scan path requires no batch logging
    cfg.TRAIN.BATCH_SIZE = 5         # force a padded remainder batch
    r_scan = train(cfg)
    assert r_scan["epochs_run"] == 2
    assert np.isfinite(r_scan["history"]["train_loss"]).all()

    cfg2 = small_cfg(str(tmp_path) + "_ps")
    cfg2.DATA.ROOT_DIR = data_root
    cfg2.TRAIN.EPOCHS = 2
    cfg2.TRAIN.LOG_INTERVAL = 0
    cfg2.TRAIN.BATCH_SIZE = 5
    cfg2.TRAIN.EPOCH_SCAN = False
    r_ps = train(cfg2)
    # same corpus + recipe: first-epoch train loss within a loose band
    # (augmentation keys differ between the two paths by design)
    a = r_scan["history"]["train_loss"][0]
    b = r_ps["history"]["train_loss"][0]
    assert abs(a - b) / max(abs(b), 1e-6) < 0.5, (a, b)
