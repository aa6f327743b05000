"""Training orchestration — TPU rebuild of /root/reference/src/train.py.

Design (SURVEY.md §3.1, §7.1 layer 5): the reference's hot loop — H2D copy
per batch, autocast forward, GradScaler backward, per-batch .item() metric
sync (train.py:82-122) — becomes ONE jitted `train_step` that fuses
device-side augmentation, the bf16 forward/backward, the optimizer update,
and metric reductions. Inputs arrive pre-sharded on the mesh's "data" axis
(data parallelism over ICI; XLA inserts the gradient all-reduce), scalars
leave the device once per epoch.

Keeps the reference's training contract: epoch loop with validation,
ReduceLROnPlateau / cosine restarts stepped per epoch, early stopping,
best-model + periodic checkpoints, resume with full history, curve plots
(train.py:175-205,207-515).
"""
from __future__ import annotations

import functools
import json
import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config
from ..data import create_datasets, make_pipelines
from ..models import create_model_from_config, init_model
from ..ops import augment as aug
from ..ops import losses as losses_lib
from ..ops import metrics as metrics_lib
from ..parallel import make_mesh, mesh_from_config, replicated, shard_batch
from ..utils.async_ckpt import (AsyncSaver, host_snapshot,
                                slim_snapshot, snapshot_state)
from .checkpoint import latest_checkpoint, restore_checkpoint, save_checkpoint
from .state import EarlyStopping, LRScheduler, TrainState, make_optimizer

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# jitted steps
# ---------------------------------------------------------------------------

def _to_float(batch):
    """Batches arrive as uint8 (4x smaller H2D copies); scale on device."""
    images = batch["image"]
    masks = batch["mask"]
    if jnp.issubdtype(images.dtype, jnp.integer):
        images = images.astype(jnp.float32) / 255.0
    if jnp.issubdtype(masks.dtype, jnp.integer):
        masks = masks.astype(jnp.float32)
    return images, masks


def make_train_step(model, loss_fn, policy_name: str, donate: bool = True):
    """Build the fused train step: augment → bf16 fwd/bwd → update → metrics."""

    def step(state: TrainState, batch, rng):
        images, masks = _to_float(batch)
        images, masks = aug.augment_batch(rng, images, masks, policy_name)
        valid = batch["valid"]
        n = images.shape[0]
        # neutralize padded samples: saturated-negative logits on zero
        # targets make every per-sample loss ~0; rescale the mean after.
        vmask = valid.reshape((n,) + (1,) * 3)

        def loss_of(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            logits = jnp.where(vmask > 0, logits, -20.0)
            targets = masks * vmask
            raw = loss_fn(logits, targets)
            scale = n / jnp.maximum(jnp.sum(valid), 1.0)
            return raw * scale, (logits, targets, mutated["batch_stats"])

        (loss, (logits, targets, new_bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        stats = metrics_lib.confusion_stats(logits, targets, valid=valid)
        return new_state, {"loss": loss, **stats}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_train_epoch_scan(model, loss_fn, policy_name: str,
                          donate: bool = True,
                          masks_packed: bool = False):
    """Whole-epoch train step: ONE device dispatch per epoch.

    With the corpus device-resident (data/pipeline.DeviceDataPipeline)
    the per-batch Python loop still pays a host→device dispatch round
    trip per step — through this environment's device tunnel that is
    tens of ms × steps/epoch of pure latency. This builds the epoch as a
    single jitted `lax.scan` over the shuffled index matrix: gather →
    augment → fwd/bwd → update, metrics summed in-scan, ONE dispatch and
    ONE scalar sync per epoch. Augmentation keys derive from a fresh
    split chain per epoch — statistically equivalent to the per-step
    loop's chain, not bit-identical to it.

    Signature: fn(images_u8, masks_u8, state, idx, valid, rng)
      idx: (nb, batch) int32 corpus indices; valid: (nb, batch) f32
    Returns (state, summed metric dict).
    """

    def step_core(state, batch, rng):
        images, masks = _to_float(batch)
        images, masks = aug.augment_batch(rng, images, masks, policy_name)
        valid = batch["valid"]
        n = images.shape[0]
        vmask = valid.reshape((n,) + (1,) * 3)

        def loss_of(params):
            logits, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                images, train=True, mutable=["batch_stats"])
            logits = jnp.where(vmask > 0, logits, -20.0)
            targets = masks * vmask
            raw = loss_fn(logits, targets)
            scale = n / jnp.maximum(jnp.sum(valid), 1.0)
            return raw * scale, (logits, targets, mutated["batch_stats"])

        (loss, (logits, targets, new_bs)), grads = jax.value_and_grad(
            loss_of, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads, new_bs)
        stats = metrics_lib.confusion_stats(logits, targets, valid=valid)
        return new_state, {"loss": loss, **stats}

    def epoch(images_u8, masks_u8, state, idx, valid, rng):
        def body(carry, xs):
            state, rng = carry
            ib, vb = xs
            rng, sub = jax.random.split(rng)
            m_u8 = jnp.take(masks_u8, ib, axis=0)
            if masks_packed:
                from ..data.pipeline import unpack_mask_bits
                m_u8 = unpack_mask_bits(m_u8)
            batch = {
                "image": jnp.take(images_u8, ib, axis=0),
                "mask": m_u8[..., None],
                "valid": vb,
            }
            state, m = step_core(state, batch, sub)
            return (state, rng), m

        (state, _), ms = jax.lax.scan(body, (state, rng), (idx, valid))
        return state, jax.tree_util.tree_map(
            lambda x: jnp.sum(x, axis=0), ms)

    return jax.jit(epoch, donate_argnums=(2,) if donate else ())


def run_train_epoch_scan(epoch_fn, state, pipeline, rng, epoch: int):
    """Drive make_train_epoch_scan over a DeviceDataPipeline: build the
    shuffled (nb, batch) index matrix the pipeline would have iterated,
    run the one-dispatch epoch. Returns (state, rng, metrics, seconds).
    """
    pipeline._ensure_device()
    n = len(pipeline.dataset)
    bs = pipeline.batch_size
    idx = np.arange(n)
    if pipeline.shuffle:
        np.random.default_rng(pipeline.seed + pipeline._epoch).shuffle(idx)
    pipeline._epoch += 1
    pad = (-n) % bs
    valid = np.ones((n + pad,), np.float32)
    if pad:
        valid[n:] = 0.0
        idx = np.concatenate([idx, np.zeros((pad,), idx.dtype)])
    nb = len(idx) // bs
    t0 = time.time()
    rng, sub = jax.random.split(rng)
    state, agg = epoch_fn(
        pipeline._images, pipeline._masks, state,
        jnp.asarray(idx.reshape(nb, bs), jnp.int32),
        jnp.asarray(valid.reshape(nb, bs)), sub)
    agg = jax.tree_util.tree_map(np.asarray, agg)  # one sync per epoch
    out = metrics_lib.metrics_from_stats(
        {k: agg[k] for k in ("tp", "fp", "fn", "tn")})
    out = {k: float(v) for k, v in out.items()}
    out["loss"] = float(agg["loss"]) / nb
    return state, rng, out, time.time() - t0


def make_eval_step(model, loss_fn, threshold: float = 0.5):
    def step(state: TrainState, batch):
        images, masks = _to_float(batch)
        images = aug.val_preprocess(images)
        valid = batch["valid"]
        n = images.shape[0]
        vmask = valid.reshape((n,) + (1,) * 3)
        logits = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            images, train=False)
        logits = jnp.where(vmask > 0, logits, -20.0)
        targets = masks * vmask
        raw = loss_fn(logits, targets)
        scale = n / jnp.maximum(jnp.sum(valid), 1.0)
        stats = metrics_lib.confusion_stats(logits, targets,
                                            threshold=threshold, valid=valid)
        return {"loss": raw * scale, "weight": jnp.sum(valid), **stats}

    return jax.jit(step)


def create_train_state(cfg: Config, seed: int = 0) -> Tuple[Any, TrainState]:
    model = create_model_from_config(cfg)
    variables = init_model(model, cfg.DATA.IMG_SIZE, seed=seed)
    tx = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )
    return model, state


# ---------------------------------------------------------------------------
# epoch loops
# ---------------------------------------------------------------------------

def run_train_epoch(train_step, state, pipeline, rng, epoch: int,
                    log_interval: int = 0):
    """One epoch; returns (state, mean metrics dict).

    Scalars sync once per epoch by default; log_interval > 0 adds the
    reference's periodic batch logging (train.py:110-117) at the cost of
    a device sync per interval."""
    agg = None
    batches = 0
    t0 = time.time()
    for batch in pipeline:
        rng, sub = jax.random.split(rng)
        state, m = train_step(state, batch, sub)
        agg = m if agg is None else jax.tree_util.tree_map(
            jnp.add, agg, m)
        batches += 1
        if log_interval and batches % log_interval == 0:
            logger.info("epoch %d batch %d: loss=%.4f", epoch + 1, batches,
                        float(m["loss"]))
    if agg is None:
        return state, rng, {"loss": float("nan")}, 0.0
    agg = jax.tree_util.tree_map(lambda x: np.asarray(x), agg)  # one sync
    out = metrics_lib.metrics_from_stats(
        {k: agg[k] for k in ("tp", "fp", "fn", "tn")})
    out = {k: float(v) for k, v in out.items()}
    out["loss"] = float(agg["loss"]) / batches
    dt = time.time() - t0
    return state, rng, out, dt


def run_eval_epoch(eval_step, state, pipeline):
    agg = None
    batches = 0
    for batch in pipeline:
        m = eval_step(state, batch)
        agg = m if agg is None else jax.tree_util.tree_map(jnp.add, agg, m)
        batches += 1
    if agg is None:
        return {"loss": float("nan")}
    agg = jax.tree_util.tree_map(lambda x: np.asarray(x), agg)
    out = metrics_lib.metrics_from_stats(
        {k: agg[k] for k in ("tp", "fp", "fn", "tn")})
    out = {k: float(v) for k, v in out.items()}
    out["loss"] = float(agg["loss"]) / batches
    return out


# ---------------------------------------------------------------------------
# plots + history (train.py:175-205)
# ---------------------------------------------------------------------------

def save_training_plots(history: Dict[str, list], output_dir: str) -> None:
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:  # noqa: BLE001
        logger.warning("matplotlib unavailable; skipping plots")
        return
    os.makedirs(output_dir, exist_ok=True)
    fig, axes = plt.subplots(1, 3, figsize=(15, 4))
    epochs = range(1, len(history["train_loss"]) + 1)
    axes[0].plot(epochs, history["train_loss"], label="train")
    axes[0].plot(epochs, history["val_loss"], label="val")
    axes[0].set_title("loss")
    axes[0].legend()
    axes[1].plot(epochs, history["val_iou"], label="IoU")
    axes[1].plot(epochs, history["val_f1"], label="F1")
    axes[1].set_title("metrics")
    axes[1].legend()
    axes[2].plot(epochs, history["lr"], label="lr")
    axes[2].set_yscale("log")
    axes[2].set_title("learning rate")
    fig.tight_layout()
    fig.savefig(os.path.join(output_dir, "training_curves.png"), dpi=120)
    plt.close(fig)


# ---------------------------------------------------------------------------
# top-level train()
# ---------------------------------------------------------------------------

def train(cfg: Config, resume_from: Optional[str] = None,
          use_blurred_mask: bool = False,
          train_ds=None, val_ds=None,
          max_steps_per_epoch: Optional[int] = None,
          init_weights: Optional[str] = None) -> Dict[str, Any]:
    """Analog of /root/reference/src/train.py:207-515.

    Returns a summary dict with best_val_loss, history, checkpoint paths.
    train_ds/val_ds may be injected (tests, auto-train); otherwise built
    from cfg.DATA.

    init_weights: optional .npz (shipped-weights format) to warm-start
    the parameters from — fine-tuning, as opposed to resume_from which
    restores the full optimizer/history state.
    """
    mesh = mesh_from_config(cfg)
    logger.info("mesh: %s", mesh)
    if train_ds is None or val_ds is None:
        train_ds, val_ds = create_datasets(cfg, use_blurred_mask)
    train_pipe, val_pipe = make_pipelines(cfg, train_ds, val_ds, mesh=mesh)

    model, state = create_train_state(cfg, seed=cfg.DATA.SEED)
    if init_weights:
        from ..utils.shipping import load_params_npz
        try:
            loaded = load_params_npz(init_weights, {"params": state.params})
        except KeyError:
            # cross-architecture warm start (e.g. UnetTPU from the shipped
            # Unet checkpoint): take every matching leaf (the shared
            # resnet34 encoder), keep fresh init for the rest
            loaded = load_params_npz(init_weights, {"params": state.params},
                                     partial=True)
        # load_params_npz already casts each leaf to the template dtype
        state = state.replace(params=loaded["params"])
        logger.info("warm-started params from %s", init_weights)
    loss_fn = losses_lib.get_loss_function(cfg)
    policy = cfg.DATA.AUGMENTATION_TYPE
    if policy not in aug.POLICIES:
        policy = "transparent_watermark"
    train_step = make_train_step(model, loss_fn, policy,
                                 donate=cfg.TRAIN.DONATE_STATE)
    eval_step = make_eval_step(model, loss_fn)
    # whole-epoch scan path: device-resident corpus + no per-batch logging
    from ..data.pipeline import DeviceDataPipeline
    epoch_scan = None
    if (getattr(cfg.TRAIN, "EPOCH_SCAN", True)
            and isinstance(train_pipe, DeviceDataPipeline)
            and not cfg.TRAIN.LOG_INTERVAL):
        train_pipe._ensure_device()  # decides mask bit-packing
        epoch_scan = make_train_epoch_scan(
            model, loss_fn, policy, donate=cfg.TRAIN.DONATE_STATE,
            masks_packed=train_pipe.masks_packed)
        logger.info("epoch-scan path: one dispatch per epoch%s",
                    " (bit-packed masks)" if train_pipe.masks_packed else "")

    scheduler = LRScheduler(cfg)
    early = EarlyStopping(cfg.TRAIN.EARLY_STOPPING_PATIENCE)
    history: Dict[str, list] = {
        "train_loss": [], "val_loss": [], "val_iou": [], "val_f1": [],
        "val_accuracy": [], "lr": [], "epoch_time": [],
        "throughput_img_s": []}
    start_epoch = 0
    best_val_loss = float("inf")

    ckpt_dir = cfg.TRAIN.CHECKPOINT_DIR
    if resume_from:
        path = resume_from
        if os.path.isdir(resume_from) and latest_checkpoint(resume_from):
            path = latest_checkpoint(resume_from)
        state, meta = restore_checkpoint(path, state)
        start_epoch = int(meta.get("epoch", 0))
        best_val_loss = float(meta.get("best_val_loss", float("inf")))
        history = meta.get("history", history)
        if "scheduler" in meta:
            scheduler.load_state_dict(meta["scheduler"])
        if "early_stopping" in meta:
            early.load_state_dict(meta["early_stopping"])
        logger.info("resumed from %s at epoch %d", path, start_epoch)

    # params/opt-state replicated over the mesh (DP: batch sharded, grads
    # all-reduced by XLA); a freshly-initialized or orbax-restored state
    # lives on device 0 only, which would clash with sharded batches.
    rep = replicated(mesh)
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, rep) if isinstance(x, jax.Array) or
        isinstance(x, np.ndarray) else x, state)

    rng = jax.random.PRNGKey(cfg.DATA.SEED)
    n_train = len(train_ds)
    best_path = None
    saver = AsyncSaver(max_pending=1)

    for epoch in range(start_epoch, cfg.TRAIN.EPOCHS):
        if epoch_scan is not None and max_steps_per_epoch is None:
            state, rng, train_m, dt = run_train_epoch_scan(
                epoch_scan, state, train_pipe, rng, epoch)
        else:
            state, rng, train_m, dt = run_train_epoch(
                train_step, state, _limit(train_pipe, max_steps_per_epoch),
                rng, epoch, log_interval=cfg.TRAIN.LOG_INTERVAL)
        val_m = run_eval_epoch(eval_step, state, val_pipe)

        lr = scheduler.step(val_m["loss"])
        state = state.with_lr(lr)

        history["train_loss"].append(train_m["loss"])
        history["val_loss"].append(val_m["loss"])
        history["val_iou"].append(val_m.get("iou", 0.0))
        history["val_f1"].append(val_m.get("f1", 0.0))
        history["val_accuracy"].append(val_m.get("accuracy", 0.0))
        history["lr"].append(lr)
        history["epoch_time"].append(dt)
        history["throughput_img_s"].append(n_train / dt if dt > 0 else 0.0)
        logger.info(
            "epoch %d: train_loss=%.4f val_loss=%.4f iou=%.4f f1=%.4f "
            "lr=%.2e (%.1fs, %.1f img/s)", epoch + 1, train_m["loss"],
            val_m["loss"], val_m.get("iou", 0), val_m.get("f1", 0), lr, dt,
            history["throughput_img_s"][-1])

        meta = {
            "epoch": epoch + 1,
            "best_val_loss": min(best_val_loss, val_m["loss"]),
            "history": history,
            "scheduler": scheduler.state_dict(),
            "early_stopping": early.state_dict(),
            "config": cfg.to_dict(),
        }
        # saves run on a background worker against an on-device snapshot
        # (the live state's buffers are donated at the next step) so the
        # D2H fetch + orbax/.pth/.npz writes overlap the next epoch
        if val_m["loss"] < best_val_loss:
            best_val_loss = val_m["loss"]
            best_path = os.path.abspath(
                os.path.join(ckpt_dir, "best_model"))
            if saver.busy():
                # at most ONE best-save snapshot device-resident: early
                # improving streaks otherwise stack snapshots beside the
                # resident corpus and OOM the next epoch (round-4 seg_r5
                # log: the batch-128 epoch-scan run died at epoch 6 with
                # two snapshots + staging in flight). Waiting here costs
                # the D2H tail only when two improvements land within one
                # transfer window; steady-state epochs are unaffected.
                saver.flush()
            # slim (no opt_state): a full snapshot held on device for the
            # length of the slow-tunnel D2H OOMed the step alongside a
            # device-cached corpus (round-3 seg_r4 log). Full-fidelity
            # resume comes from the periodic checkpoints below.
            snap = slim_snapshot(state)
            saver.submit(_save_best, cfg, ckpt_dir, snap, dict(meta))
        if not cfg.TRAIN.SAVE_BEST_ONLY and (
                (epoch + 1) % cfg.TRAIN.SAVE_INTERVAL == 0):
            # full checkpoint (with opt_state) via zero-HBM host fetch —
            # its 3x-params on-device snapshot OOMs beside a resident
            # corpus at batch 128 (utils/async_ckpt.host_snapshot)
            saver.submit(save_checkpoint, ckpt_dir,
                         f"checkpoint_epoch_{epoch + 1}",
                         host_snapshot(state), dict(meta))

        if cfg.TRAIN.USE_EARLY_STOPPING and early(val_m["loss"]):
            logger.info("early stopping at epoch %d", epoch + 1)
            break

        # host-memory guard: transfer staging through this environment's
        # device tunnel has been observed to retain per-batch host buffers;
        # collect cycles eagerly and log pressure so long runs fail loudly
        # instead of being OOM-killed
        import gc
        from ..utils.memory import get_global_memory_manager
        mm = get_global_memory_manager()
        level = mm.check_memory_pressure()
        if level != "ok":
            gc.collect()
            snap = mm.snapshot()
            logger.warning("host memory %s after epoch %d: %.1f%% used",
                           level, epoch + 1, snap.host_percent)

    saver.flush()  # all checkpoints durable before reporting; loud on error
    saver.close()
    save_training_plots(history, cfg.TRAIN.OUTPUT_DIR)
    os.makedirs(cfg.TRAIN.OUTPUT_DIR, exist_ok=True)
    with open(os.path.join(cfg.TRAIN.OUTPUT_DIR, "training_history.json"),
              "w") as f:
        json.dump(history, f, indent=2)
    return {
        "best_val_loss": best_val_loss,
        "epochs_run": len(history["train_loss"]),
        "history": history,
        "best_checkpoint": best_path,
        "state": state,
    }


def _limit(pipeline, max_steps: Optional[int]):
    if max_steps is None:
        return pipeline

    def gen():
        for i, b in enumerate(pipeline):
            if i >= max_steps:
                break
            yield b

    return gen()


def _save_best(cfg: Config, ckpt_dir: str, state: TrainState,
               meta: Dict[str, Any]) -> None:
    """Best-model save job (async worker): orbax dir + .pth + .npz."""
    save_checkpoint(ckpt_dir, "best_model", state, meta)
    _export_pth(cfg, state, meta)


def _export_pth(cfg: Config, state: TrainState, meta: Dict[str, Any]) -> None:
    """Best-model .pth export for reference drop-in compat
    (train.py:425-435)."""
    try:
        from ..models.torch_import import export_pth
        path = cfg.TRAIN.MODEL_SAVE_PATH
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        export_pth(path, cfg, state.params, state.batch_stats,
                   epoch=meta["epoch"], best_val_loss=meta["best_val_loss"])
    except Exception as e:  # noqa: BLE001
        logger.warning(".pth export skipped: %s", e)
    try:
        # compact bf16 .npz beside the .pth — the shipped-weights format
        # inference/predict.py:default_seg_weights resolves from
        # unet_watermark_tpu/weights/ on a fresh clone
        from ..utils.shipping import save_params_npz, seg_weights_filename
        npz_path = os.path.join(
            os.path.dirname(os.path.abspath(cfg.TRAIN.MODEL_SAVE_PATH)),
            seg_weights_filename(cfg))
        save_params_npz(npz_path, {"params": state.params,
                                   "batch_stats": state.batch_stats})
    except Exception as e:  # noqa: BLE001
        logger.warning(".npz shipping export skipped: %s", e)
