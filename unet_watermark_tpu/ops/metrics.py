"""Segmentation metrics as jitted reductions — analog of
/root/reference/src/utils/metrics.py.

The reference computes tp/fp/fn/tn via smp.metrics.get_stats then micro
IoU/F1/accuracy/precision/recall (metrics.py:11-37) plus standalone
dice_coef/iou_score (:39-53). Here the stats are one fused reduction on
device; metric dicts are tiny scalars so evaluation never leaves the TPU.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

Array = jax.Array


def confusion_stats(logits: Array, targets: Array,
                    threshold: float = 0.5,
                    valid: Array = None) -> Dict[str, Array]:
    """tp/fp/fn/tn over the whole batch (micro, like smp get_stats+micro).

    `valid` is an optional (N,) 0/1 sample weight so padded remainder
    batches (parallel/mesh.py:pad_batch_to) don't pollute the counts.
    """
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    pred = (probs > threshold).astype(jnp.float32)
    t = (targets > 0.5).astype(jnp.float32)
    if valid is not None:
        w = valid.reshape((-1,) + (1,) * (pred.ndim - 1)).astype(jnp.float32)
        pred = pred * w
        t = t * w
        real = w * jnp.ones_like(pred)
    else:
        real = jnp.ones_like(pred)
    tp = jnp.sum(pred * t)
    fp = jnp.sum(pred * (real - t))
    fn = jnp.sum((real - pred) * t)
    tn = jnp.sum((real - pred) * (real - t))
    return {"tp": tp, "fp": fp, "fn": fn, "tn": tn}


def metrics_from_stats(stats: Dict[str, Array], eps: float = 1e-7) -> Dict[str, Array]:
    tp, fp, fn, tn = stats["tp"], stats["fp"], stats["fn"], stats["tn"]
    iou = tp / (tp + fp + fn + eps)
    precision = tp / (tp + fp + eps)
    recall = tp / (tp + fn + eps)
    f1 = 2 * tp / (2 * tp + fp + fn + eps)
    accuracy = (tp + tn) / (tp + fp + fn + tn + eps)
    dice = f1
    return {"iou": iou, "f1": f1, "accuracy": accuracy,
            "precision": precision, "recall": recall, "dice": dice}


def compute_metrics(logits: Array, targets: Array,
                    threshold: float = 0.5) -> Dict[str, Array]:
    """Analog of get_metrics() usage in the train loop
    (/root/reference/src/train.py:110-117)."""
    return metrics_from_stats(confusion_stats(logits, targets, threshold))


def dice_coef(pred: Array, target: Array, smooth: float = 1e-5) -> Array:
    """Standalone soft dice on probabilities (metrics.py:39-46)."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    inter = jnp.sum(pred * target)
    return (2.0 * inter + smooth) / (jnp.sum(pred) + jnp.sum(target) + smooth)


def iou_score(pred: Array, target: Array, smooth: float = 1e-5) -> Array:
    """Standalone IoU on probabilities (metrics.py:47-53)."""
    pred = pred.reshape(-1).astype(jnp.float32)
    target = target.reshape(-1).astype(jnp.float32)
    inter = jnp.sum(pred * target)
    union = jnp.sum(pred) + jnp.sum(target) - inter
    return (inter + smooth) / (union + smooth)


def psnr(pred: Array, target: Array, max_val: float = 1.0,
         mask: Array = None) -> Array:
    """Peak signal-to-noise ratio in dB; with `mask` (same spatial shape,
    1 = evaluate) restricted to the masked region — used for inpainting
    hole-quality scoring (no reference counterpart: the reference never
    measures fill quality)."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if mask is not None:
        w = jnp.broadcast_to(mask.astype(jnp.float32), pred.shape)
        mse = jnp.sum(((pred - target) ** 2) * w) / jnp.maximum(
            jnp.sum(w), 1.0)
    else:
        mse = jnp.mean((pred - target) ** 2)
    return 10.0 * jnp.log10(max_val ** 2 / jnp.maximum(mse, 1e-12))


def ssim(pred: Array, target: Array, max_val: float = 1.0,
         ksize: int = 11, sigma: float = 1.5) -> Array:
    """Mean structural similarity (Wang et al. 2004), Gaussian 11x1.5
    window, standard C1/C2 — matches skimage/tf defaults. Inputs NHWC or
    HWC in [0, max_val]."""
    from . import morphology as m

    if pred.ndim == 3:
        pred, target = pred[None], target[None]
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    blur = lambda x: m.gaussian_blur(  # noqa: E731
        x.transpose(0, 3, 1, 2).reshape((-1,) + x.shape[1:3]),
        (ksize, ksize), sigma).reshape(
        (x.shape[0], x.shape[3]) + x.shape[1:3]).transpose(0, 2, 3, 1)
    mu_p, mu_t = blur(pred), blur(target)
    var_p = blur(pred * pred) - mu_p * mu_p
    var_t = blur(target * target) - mu_t * mu_t
    cov = blur(pred * target) - mu_p * mu_t
    num = (2 * mu_p * mu_t + c1) * (2 * cov + c2)
    den = (mu_p ** 2 + mu_t ** 2 + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


def get_metrics():
    """Analog of /root/reference/src/utils/metrics.py:11 — returns the
    metric-fn dict used by the train/validate loops."""
    return {
        "stats": confusion_stats,
        "from_stats": metrics_from_stats,
        "compute": compute_metrics,
        "dice": dice_coef,
        "iou": iou_score,
    }
