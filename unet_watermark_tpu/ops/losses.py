"""Segmentation losses in pure jnp — analog of /root/reference/src/utils/losses.py.

The reference delegates to smp.losses (DiceLoss, JaccardLoss,
SoftBCEWithLogitsLoss, FocalLoss, TverskyLoss, LovaszLoss) and combines them
with configured weights (losses.py:11-51). Here each loss is a jittable
function over fp32 logits (N,H,W,1) and binary targets, fusing into the
train step — no host round-trips.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp


Array = jax.Array


def _flatten(logits: Array, targets: Array):
    logits = logits.reshape(logits.shape[0], -1).astype(jnp.float32)
    targets = targets.reshape(targets.shape[0], -1).astype(jnp.float32)
    return logits, targets


def dice_loss(logits: Array, targets: Array, smooth: float = 1e-5) -> Array:
    """Soft Dice over probabilities (smp DiceLoss, mode='binary')."""
    logits, targets = _flatten(logits, targets)
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * targets, axis=1)
    denom = jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1)
    dice = (2.0 * inter + smooth) / (denom + smooth)
    return jnp.mean(1.0 - dice)


def jaccard_loss(logits: Array, targets: Array, smooth: float = 1e-5) -> Array:
    """Soft IoU loss (smp JaccardLoss)."""
    logits, targets = _flatten(logits, targets)
    probs = jax.nn.sigmoid(logits)
    inter = jnp.sum(probs * targets, axis=1)
    union = jnp.sum(probs, axis=1) + jnp.sum(targets, axis=1) - inter
    iou = (inter + smooth) / (union + smooth)
    return jnp.mean(1.0 - iou)


def bce_loss(logits: Array, targets: Array) -> Array:
    """Sigmoid BCE with logits (smp SoftBCEWithLogitsLoss, no smoothing)."""
    logits, targets = _flatten(logits, targets)
    per_elem = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    return jnp.mean(per_elem)


def focal_loss(logits: Array, targets: Array, alpha: float = 0.25,
               gamma: float = 2.0) -> Array:
    """Binary focal loss (smp FocalLoss, mode='binary')."""
    logits, targets = _flatten(logits, targets)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
    return jnp.mean(alpha_t * (1.0 - p_t) ** gamma * ce)


def tversky_loss(logits: Array, targets: Array, alpha: float = 0.5,
                 beta: float = 0.5, smooth: float = 1e-5) -> Array:
    """Tversky loss (smp TverskyLoss): generalizes Dice with FP/FN weights."""
    logits, targets = _flatten(logits, targets)
    probs = jax.nn.sigmoid(logits)
    tp = jnp.sum(probs * targets, axis=1)
    fp = jnp.sum(probs * (1.0 - targets), axis=1)
    fn = jnp.sum((1.0 - probs) * targets, axis=1)
    tv = (tp + smooth) / (tp + alpha * fp + beta * fn + smooth)
    return jnp.mean(1.0 - tv)


def lovasz_hinge_loss(logits: Array, targets: Array) -> Array:
    """Lovasz hinge (Berman et al. 2018) — per-image, jit-compatible.

    Uses a full sort (XLA top-k) instead of data-dependent loops.
    """
    logits, targets = _flatten(logits, targets)

    def per_image(log, lab):
        signs = 2.0 * lab - 1.0
        errors = 1.0 - log * signs
        order = jnp.argsort(-errors)
        errors_sorted = errors[order]
        lab_sorted = lab[order]
        gts = jnp.sum(lab_sorted)
        intersection = gts - jnp.cumsum(lab_sorted)
        union = gts + jnp.cumsum(1.0 - lab_sorted)
        jaccard = 1.0 - intersection / jnp.maximum(union, 1e-8)
        grad = jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])
        return jnp.sum(jax.nn.relu(errors_sorted) * grad)

    return jnp.mean(jax.vmap(per_image)(logits, targets))


def edge_loss(logits: Array, targets: Array) -> Array:
    """Edge-consistency loss (unet_text_watermark.yaml EDGE_LOSS_WEIGHT):
    L1 between Sobel gradients of prediction and target."""
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    t = targets.astype(jnp.float32)

    def sobel(x):
        # x: (N,H,W,1)
        kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
        ky = kx.T
        k = jnp.stack([kx, ky], axis=-1)[:, :, None, :]  # HWIO (3,3,1,2)
        g = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return g

    return jnp.mean(jnp.abs(sobel(probs) - sobel(t)))


class CombinedLoss:
    """Weighted Dice + BCE + Focal (+edge) — analog of
    /root/reference/src/utils/losses.py:33-51 extended with the text-config
    edge term (unet_text_watermark.yaml:63-66)."""

    def __init__(self, bce_weight: float = 0.5, dice_weight: float = 0.5,
                 focal_weight: float = 0.0, edge_weight: float = 0.0,
                 smooth: float = 1e-5, focal_alpha: float = 0.25,
                 focal_gamma: float = 2.0):
        self.bce_weight = bce_weight
        self.dice_weight = dice_weight
        self.focal_weight = focal_weight
        self.edge_weight = edge_weight
        self.smooth = smooth
        self.focal_alpha = focal_alpha
        self.focal_gamma = focal_gamma

    def __call__(self, logits: Array, targets: Array) -> Array:
        loss = self.bce_weight * bce_loss(logits, targets)
        loss += self.dice_weight * dice_loss(logits, targets, self.smooth)
        if self.focal_weight:
            loss += self.focal_weight * focal_loss(
                logits, targets, self.focal_alpha, self.focal_gamma)
        if self.edge_weight:
            loss += self.edge_weight * edge_loss(logits, targets)
        return loss


def get_loss_function(cfg) -> Callable[[Array, Array], Array]:
    """Analog of /root/reference/src/utils/losses.py:11-31."""
    name = cfg.LOSS.NAME
    smooth = cfg.LOSS.SMOOTH
    if name == "DiceLoss":
        return lambda lg, tg: dice_loss(lg, tg, smooth)
    if name == "JaccardLoss":
        return lambda lg, tg: jaccard_loss(lg, tg, smooth)
    if name in ("BCELoss", "SoftBCEWithLogitsLoss", "BCEWithLogitsLoss"):
        return bce_loss
    if name == "FocalLoss":
        return lambda lg, tg: focal_loss(lg, tg, cfg.LOSS.FOCAL_ALPHA,
                                         cfg.LOSS.FOCAL_GAMMA)
    if name == "TverskyLoss":
        return lambda lg, tg: tversky_loss(lg, tg, smooth=smooth)
    if name == "LovaszLoss":
        return lovasz_hinge_loss
    if name == "CombinedLoss":
        return CombinedLoss(
            bce_weight=cfg.LOSS.BCE_WEIGHT,
            dice_weight=cfg.LOSS.DICE_WEIGHT,
            focal_weight=cfg.LOSS.FOCAL_WEIGHT,
            edge_weight=cfg.LOSS.EDGE_LOSS_WEIGHT,
            smooth=smooth,
            focal_alpha=cfg.LOSS.FOCAL_ALPHA,
            focal_gamma=cfg.LOSS.FOCAL_GAMMA,
        )
    raise ValueError(f"unsupported loss '{name}'")
