"""Type-aware mask optimization + watermark-type detection, on device.

Device rebuild of /root/reference/src/predict.py:161-301 (the three
_optimize_* strategies) and :414-558 (_detect_watermark_type with geometric
and gradient analysis). The reference runs these per-image through cv2 on
the host; here each strategy is one jittable graph over (H, W) masks built
from the parity-tested XLA ops (ops/morphology, ops/components), batchable
via vmap and fusable into the detect→inpaint pipeline.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import components as cc
from ..ops import morphology as m

Array = jax.Array


# ---------------------------------------------------------------------------
# the three optimization strategies (predict.py:188-301)
# ---------------------------------------------------------------------------

def optimize_watermark_mask(mask: Array) -> Array:
    """predict.py:231-272: open(3) → close(7)x3 → close(11)x2 → dilate(9)x2
    → largest-component rule → Gaussian smooth + re-threshold."""
    x = m.morph_open(mask, m.ellipse_kernel(3, 3), 1)
    x = m.morph_close(x, m.ellipse_kernel(7, 7), 3)
    x = m.morph_close(x, m.ellipse_kernel(11, 11), 2)
    x = m.dilate(x, m.ellipse_kernel(9, 9), 2)
    x = cc.keep_largest_component(x, min_keep_area=500, fallback_min_area=200)
    x = m.gaussian_blur(x, (3, 3), 0.5)
    return m.threshold_binary(x, 0.5)


def optimize_text_mask(mask: Array) -> Array:
    """predict.py:188-229: open(2) → close(3)x2 → directional closes
    (5x1 | 1x5) → dilate(4) → keep components with area > 50."""
    x = m.morph_open(mask, m.ellipse_kernel(2, 2), 1)
    x = m.morph_close(x, m.ellipse_kernel(3, 3), 2)
    xh = m.morph_close(x, m.rect_kernel(5, 1), 1)
    xv = m.morph_close(x, m.rect_kernel(1, 5), 1)
    x = jnp.maximum(xh, xv)  # bitwise_or on binary masks
    x = m.dilate(x, m.ellipse_kernel(4, 4), 1)
    return cc.filter_components_by_area(x, min_area=50)


def optimize_mixed_mask(mask: Array) -> Array:
    """predict.py:274-301: open(2) → close(5)x2 → dilate(6) → area > 100."""
    x = m.morph_open(mask, m.ellipse_kernel(2, 2), 1)
    x = m.morph_close(x, m.ellipse_kernel(5, 5), 2)
    x = m.dilate(x, m.ellipse_kernel(6, 6), 1)
    return cc.filter_components_by_area(x, min_area=100)


def optimize_watermark_mask_tight(mask: Array) -> Array:
    """PREDICT.MASK_MODE="tight" (round 4): precision-preserving
    alternative to the cv2-parity chain above.

    The parity chain intentionally over-covers (close(11)x2 + dilate(9)x2
    drops precision to ~0.36) and its largest-component rule discards
    secondary marks on ~35% of multi-watermark protocol images
    (docs/QUALITY.md). Tight mode keeps ALL components above a small
    area floor and trims the margin to one 3px dilation: open(3) →
    close(5) → dilate(3) → area>64 → Gaussian re-threshold. Measured on
    the frozen protocol (docs/QUALITY.md tight rows). Parity mode stays
    the default and is byte-identical to the reference chain."""
    x = m.morph_open(mask, m.ellipse_kernel(3, 3), 1)
    x = m.morph_close(x, m.ellipse_kernel(5, 5), 1)
    x = m.dilate(x, m.ellipse_kernel(3, 3), 1)
    x = cc.filter_components_by_area(x, min_area=64)
    x = m.gaussian_blur(x, (3, 3), 0.5)
    return m.threshold_binary(x, 0.5)


def resolve_mask_mode(mode: str, surface: str) -> str:
    """Resolve PREDICT.MASK_MODE for one of the two consumer surfaces.

    "auto" (the round-5 default) keeps the reference's cv2-parity chain
    for mask ARTIFACTS (surface="artifact": the step-1/step-3 mask files
    a reference user diffs against) but uses the precision-preserving
    tight chain for the REPAIR path (surface="repair": the mask that
    decides which pixels get repainted) — the parity chain's deliberate
    over-coverage repaints clean texture and measures below the no-op
    floor on the textured protocol tier (docs/QUALITY.md e2e tables).
    Explicit "parity"/"tight" apply to both surfaces unchanged."""
    if mode != "auto":
        return mode
    return "tight" if surface == "repair" else "parity"


def optimize_mask(mask: Array, mask_type: str = "watermark",
                  mode: str = "parity") -> Array:
    """Dispatch like predict.py:161-186. mask: (H,W) float {0,1}.

    mode="tight" swaps the watermark strategy for the
    precision-preserving chain; text/mixed strategies already keep all
    components and use small dilations, so they are shared."""
    mask = m.threshold_binary(mask, 0.5)
    if mask_type == "text":
        return optimize_text_mask(mask)
    if mask_type == "mixed":
        return optimize_mixed_mask(mask)
    if mode == "tight":
        return optimize_watermark_mask_tight(mask)
    return optimize_watermark_mask(mask)


def optimize_watermark_mask_batch_pallas(masks: Array) -> Array:
    """Batched watermark-mask optimization with the Pallas VMEM-resident
    morphology chain (ops/pallas/morph_chain.py): the whole open/close/
    dilate sequence runs on-chip in one kernel instead of ~14 HBM-round-
    trip convs; the connected-component stage stays XLA (global iterative)
    and the final Gaussian+threshold is a second VMEM kernel.

    masks: (N, S, S) binary. Output matches optimize_watermark_mask
    exactly (tested).
    """
    from ..ops.pallas.morph_chain import (
        gaussian_smooth_threshold,
        morph_chain_watermark,
    )

    x = morph_chain_watermark(masks)
    x = jax.vmap(lambda mk: cc.keep_largest_component(
        mk, min_keep_area=500, fallback_min_area=200))(x)
    return gaussian_smooth_threshold(x)


# Pre-jitted per-type single-image variants (one compile per shape).
optimize_watermark_mask_jit = jax.jit(optimize_watermark_mask)
optimize_text_mask_jit = jax.jit(optimize_text_mask)
optimize_mixed_mask_jit = jax.jit(optimize_mixed_mask)


@functools.partial(jax.jit, static_argnames=())
def optimize_mask_by_type(mask: Array, type_code: Array) -> Array:
    """Per-image dispatch (0=watermark, 1=text, 2=mixed) via lax.switch.

    Single-image only: do NOT vmap this — lax.switch over branches that
    contain the label-propagation while_loop miscompiles under vmap on
    TPU (observed: all-zero outputs for batch >= 2). Batched pipelines
    use optimize_mask_batch_by_type below.
    """
    mask = m.threshold_binary(mask, 0.5)
    return jax.lax.switch(
        type_code,
        [optimize_watermark_mask, optimize_text_mask, optimize_mixed_mask],
        mask)


@jax.jit
def optimize_mask_batch_by_type(masks: Array, codes: Array) -> Array:
    """Batched per-type optimization in ONE graph: run all three strategies
    vmapped over the batch and select per element. 3x the morphology
    compute — kept only as the fallback for callers that need a single
    jitted graph with device-resident codes; the production batched
    pipeline uses optimize_mask_batch_partitioned (one strategy per image).
    The straightforward vmap(switch(while_loop)) miscompiles on TPU
    (all-zero outputs for batch >= 2; repro in docs/PERFORMANCE.md).

    masks: (N, H, W) binary; codes: (N,) int32 in {0,1,2}.
    """
    masks = m.threshold_binary(masks, 0.5)
    w = jax.vmap(optimize_watermark_mask)(masks)
    t = jax.vmap(optimize_text_mask)(masks)
    x = jax.vmap(optimize_mixed_mask)(masks)
    sel = codes.reshape(-1, 1, 1)
    return jnp.where(sel == 0, w, jnp.where(sel == 1, t, x))


# vmapped + jitted per-strategy batch functions (one compile per shape)
_BATCH_STRATEGY = {
    0: jax.jit(jax.vmap(lambda mk: optimize_watermark_mask(
        m.threshold_binary(mk, 0.5)))),
    1: jax.jit(jax.vmap(lambda mk: optimize_text_mask(
        m.threshold_binary(mk, 0.5)))),
    2: jax.jit(jax.vmap(lambda mk: optimize_mixed_mask(
        m.threshold_binary(mk, 0.5)))),
}
# tight mode swaps only the watermark strategy (code 0)
_BATCH_STRATEGY_TIGHT = dict(_BATCH_STRATEGY)
_BATCH_STRATEGY_TIGHT[0] = jax.jit(jax.vmap(
    lambda mk: optimize_watermark_mask_tight(m.threshold_binary(mk, 0.5))))


def optimize_mask_batch_partitioned(masks, codes,
                                    mode: str = "parity") -> "np.ndarray":
    """One strategy per image: partition the batch by (host-known) type
    code and run each strategy once on its padded slice.

    This replaces the 3x-compute workaround above for the batched step-1
    path: type codes are computed on host anyway (classify_type), so the
    partition is free, plain vmap over each single strategy compiles
    correctly (only vmap(lax.switch(...while_loop)) miscompiles), and each
    image runs exactly one strategy. Slices are zero-padded to the next
    power of two so compiles are cached across batches.

    masks: (N, H, W) float/bool array (numpy or jax); codes: length-N
    sequence of ints in {0,1,2}. Returns float32 (N, H, W) numpy.
    """
    import numpy as np

    masks = np.asarray(masks, np.float32)
    out = np.empty_like(masks)
    strategies = _BATCH_STRATEGY_TIGHT if mode == "tight" else _BATCH_STRATEGY
    by_type: dict = {}
    for i, c in enumerate(codes):
        by_type.setdefault(int(c), []).append(i)
    for c, idx in by_type.items():
        n = len(idx)
        padded_n = 1 << (n - 1).bit_length()
        sub = np.zeros((padded_n,) + masks.shape[1:], np.float32)
        sub[:n] = masks[idx]
        res = np.asarray(strategies[c](jnp.asarray(sub)))
        out[idx] = res[:n]
    return out


# ---------------------------------------------------------------------------
# watermark type detection (predict.py:414-558)
# ---------------------------------------------------------------------------

def _analyze_text_features(mask: Array) -> Array:
    """Geometric text-likeness score in [0,1] (predict.py:445-509):
    per-component aspect-ratio / density / area scoring, fraction of
    text-like components, +0.2 bonus for >=3 mostly-text components."""
    labels = cc.label_components(mask)
    stats = cc.component_stats(labels)
    area = stats["area"].astype(jnp.float32)
    width = stats["width"].astype(jnp.float32)
    height = stats["height"].astype(jnp.float32)
    exists = stats["exists"] & (area > 0) & (width > 0) & (height > 0)

    aspect = jnp.where(exists,
                       jnp.maximum(width, height) /
                       jnp.maximum(jnp.minimum(width, height), 1.0), 0.0)
    density = jnp.where(exists, area / jnp.maximum(width * height, 1.0), 0.0)

    score = jnp.zeros_like(area)
    score += jnp.where((aspect >= 1) & (aspect <= 5), 0.3,
                       jnp.where((aspect > 5) & (aspect <= 10), 0.1, 0.0))
    score += jnp.where((density >= 0.3) & (density <= 0.8), 0.3,
                       jnp.where(((density >= 0.2) & (density < 0.3)) |
                                 ((density > 0.8) & (density <= 0.9)),
                                 0.1, 0.0))
    score += jnp.where((area >= 50) & (area <= 5000), 0.4,
                       jnp.where(((area >= 20) & (area < 50)) |
                                 ((area > 5000) & (area <= 10000)),
                                 0.2, 0.0))
    score = jnp.where(exists, score, 0.0)

    total = jnp.sum(exists.astype(jnp.float32))
    indicators = jnp.sum(((score > 0.5) & exists).astype(jnp.float32))
    ratio = jnp.where(total > 0, indicators / jnp.maximum(total, 1.0), 0.0)
    bonus = jnp.where((total >= 3) & (ratio > 0.5),
                      jnp.minimum(ratio + 0.2, 1.0), ratio)
    return jnp.where(jnp.sum(mask) > 0, bonus, 0.0)


def _sobel(gray: Array) -> Tuple[Array, Array]:
    kx = jnp.asarray([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    x = gray[None, :, :, None]
    conv = lambda k: jax.lax.conv_general_dilated(
        x, k[:, :, None, None], (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return conv(kx), conv(ky)


def _analyze_gradient_features(image_gray: Array, mask: Array) -> Array:
    """Gradient-based text score in [0,1] (predict.py:511-558).

    Deviations from the reference, by design: the edge map is a Sobel
    gradient-magnitude threshold rather than full Canny (hysteresis is a
    serial algorithm; the score only consumes edge *density*, for which
    magnitude thresholding is an equivalent signal on TPU).
    """
    masked = image_gray * mask
    gx, gy = _sobel(masked)
    mag = jnp.sqrt(gx * gx + gy * gy)
    edges = (mag > 100.0).astype(jnp.float32)
    mask_px = jnp.sum(mask)
    edge_density = jnp.where(mask_px > 0, jnp.sum(edges * mask) /
                             jnp.maximum(mask_px, 1.0), 0.0)

    angles = jnp.arctan2(gy, gx)
    mean = jnp.sum(angles * mask) / jnp.maximum(mask_px, 1.0)
    var = jnp.sum(((angles - mean) ** 2) * mask) / jnp.maximum(mask_px, 1.0)

    score = jnp.where((edge_density >= 0.1) & (edge_density <= 0.4), 0.5,
                      jnp.where(((edge_density >= 0.05) &
                                 (edge_density < 0.1)) |
                                ((edge_density > 0.4) &
                                 (edge_density <= 0.6)), 0.2, 0.0))
    score += jnp.where((var >= 1.0) & (var <= 3.0), 0.5,
                       jnp.where(((var >= 0.5) & (var < 1.0)) |
                                 ((var > 3.0) & (var <= 4.0)), 0.2, 0.0))
    return jnp.minimum(score, 1.0)


@jax.jit
def detect_watermark_type_scores(image_rgb: Array, mask: Array) -> Array:
    """Combined text score (predict.py:440-443): 0.6*geometric + 0.4*ocr.

    image_rgb: (H,W,3) float [0,255]; mask: (H,W) {0,1}.
    Returns the scalar total_text_score; threshold at 0.7/0.3 for
    text/mixed/watermark.
    """
    gray = (0.299 * image_rgb[..., 0] + 0.587 * image_rgb[..., 1] +
            0.114 * image_rgb[..., 2])
    ts = _analyze_text_features(mask)
    os_ = _analyze_gradient_features(gray, mask)
    return ts * 0.6 + os_ * 0.4


def classify_type(score: float) -> str:
    if score > 0.7:
        return "text"
    if score > 0.3:
        return "mixed"
    return "watermark"


def type_code(name: str) -> int:
    return {"watermark": 0, "text": 1, "mixed": 2}[name]
