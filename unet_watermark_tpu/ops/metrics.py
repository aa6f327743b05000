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
