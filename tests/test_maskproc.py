"""Mask-optimization strategies vs a cv2 reimplementation of the reference
semantics (predict.py:161-301)."""
import cv2
import numpy as np
import pytest

import jax.numpy as jnp

from unet_watermark_tpu.inference import maskproc


def cv2_optimize_watermark(mask_u8):
    k = lambda s: cv2.getStructuringElement(cv2.MORPH_ELLIPSE, s)
    m = cv2.morphologyEx(mask_u8, cv2.MORPH_OPEN, k((3, 3)), iterations=1)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k((7, 7)), iterations=3)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k((11, 11)), iterations=2)
    m = cv2.dilate(m, k((9, 9)), iterations=2)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    if n > 1:
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        max_area = stats[largest, cv2.CC_STAT_AREA]
        if max_area >= 500:
            m = (labels == largest).astype(np.uint8) * 255
        else:
            keep = np.zeros_like(labels, np.uint8)
            for i in range(1, n):
                if stats[i, cv2.CC_STAT_AREA] > 200:
                    keep[labels == i] = 255
            m = keep
    m = cv2.GaussianBlur(m, (3, 3), 0.5)
    _, m = cv2.threshold(m, 127, 255, cv2.THRESH_BINARY)
    return m


def cv2_optimize_text(mask_u8):
    k = lambda s: cv2.getStructuringElement(cv2.MORPH_ELLIPSE, s)
    r = lambda s: cv2.getStructuringElement(cv2.MORPH_RECT, s)
    m = cv2.morphologyEx(mask_u8, cv2.MORPH_OPEN, k((2, 2)), iterations=1)
    m = cv2.morphologyEx(m, cv2.MORPH_CLOSE, k((3, 3)), iterations=2)
    mh = cv2.morphologyEx(m, cv2.MORPH_CLOSE, r((5, 1)), iterations=1)
    mv = cv2.morphologyEx(m, cv2.MORPH_CLOSE, r((1, 5)), iterations=1)
    m = cv2.bitwise_or(mh, mv)
    m = cv2.dilate(m, k((4, 4)), iterations=1)
    n, labels, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    if n > 1:
        keep = np.zeros_like(labels, np.uint8)
        for i in range(1, n):
            if stats[i, cv2.CC_STAT_AREA] > 50:
                keep[labels == i] = 255
        m = keep
    return m


def _blobby_mask(rng, h=96, w=96):
    m = np.zeros((h, w), np.uint8)
    for _ in range(6):
        y, x = rng.integers(5, h - 20), rng.integers(5, w - 20)
        m[y:y + rng.integers(3, 15), x:x + rng.integers(3, 15)] = 255
    return m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_watermark_strategy_matches_cv2(rng, seed):
    mask = _blobby_mask(np.random.default_rng(seed))
    ref = cv2_optimize_watermark(mask)
    ours = np.asarray(maskproc.optimize_watermark_mask(
        jnp.asarray(mask.astype(np.float32) / 255)))
    mismatch = np.mean((ours > 0.5) != (ref > 127))
    assert mismatch < 0.01, mismatch  # sub-1%: Gaussian edge rounding only


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_text_strategy_matches_cv2(seed):
    mask = _blobby_mask(np.random.default_rng(seed + 10))
    ref = cv2_optimize_text(mask)
    ours = np.asarray(maskproc.optimize_text_mask(
        jnp.asarray(mask.astype(np.float32) / 255)))
    np.testing.assert_array_equal((ours > 0.5), ref > 127)


def test_dispatch_by_type_code():
    mask = _blobby_mask(np.random.default_rng(5))
    f = jnp.asarray(mask.astype(np.float32) / 255)
    import jax
    for code, fn in [(0, maskproc.optimize_watermark_mask),
                     (1, maskproc.optimize_text_mask),
                     (2, maskproc.optimize_mixed_mask)]:
        a = np.asarray(maskproc.optimize_mask_by_type(f, jnp.int32(code)))
        b = np.asarray(fn(f))
        np.testing.assert_array_equal(a, b)


def test_type_detection_text_vs_blob():
    """Many small text-like components → higher score than one big blob."""
    rng = np.random.default_rng(0)
    img = (rng.random((128, 128, 3)) * 255).astype(np.float32)

    text_mask = np.zeros((128, 128), np.float32)
    for i in range(6):  # small letter-ish components
        x = 10 + i * 18
        text_mask[60:72, x:x + 10] = 1.0

    blob_mask = np.zeros((128, 128), np.float32)
    blob_mask[20:110, 20:110] = 1.0

    s_text = float(maskproc.detect_watermark_type_scores(
        jnp.asarray(img), jnp.asarray(text_mask)))
    s_blob = float(maskproc.detect_watermark_type_scores(
        jnp.asarray(img), jnp.asarray(blob_mask)))
    assert s_text > s_blob
    assert maskproc.classify_type(s_blob) == "watermark"


def test_empty_mask_scores_zero():
    img = np.zeros((64, 64, 3), np.float32)
    mask = np.zeros((64, 64), np.float32)
    s = float(maskproc.detect_watermark_type_scores(
        jnp.asarray(img), jnp.asarray(mask)))
    assert s == 0.0


def test_batched_dispatch_matches_unbatched():
    """Regression: the batched per-type optimizer must equal per-image
    results (vmap(lax.switch(while_loop)) miscompiled on TPU — the batch
    path now computes all strategies and selects)."""
    rng = np.random.default_rng(7)
    masks = np.zeros((3, 96, 96), np.float32)
    for i in range(3):
        for _ in range(4):
            y, x = rng.integers(5, 70, 2)
            masks[i, y:y + 12, x:x + 18] = 1.0
    codes = jnp.asarray([0, 1, 2])
    batched = np.asarray(maskproc.optimize_mask_batch_by_type(
        jnp.asarray(masks), codes))
    fns = [maskproc.optimize_watermark_mask, maskproc.optimize_text_mask,
           maskproc.optimize_mixed_mask]
    for i, fn in enumerate(fns):
        single = np.asarray(fn(jnp.asarray(masks[i])))
        np.testing.assert_array_equal(batched[i], single)
        assert batched[i].mean() > 0  # not silently zeroed


def test_optimize_mask_batch_partitioned_matches_single():
    """The host-partitioned batch path (one strategy per image) matches the
    single-image strategies exactly."""
    import jax.numpy as jnp
    import numpy as np

    from unet_watermark_tpu.inference import maskproc

    rng = np.random.default_rng(11)
    masks = (rng.random((5, 64, 64)) > 0.8).astype(np.float32)
    codes = [0, 1, 2, 0, 1]
    names = {0: "watermark", 1: "text", 2: "mixed"}
    part = maskproc.optimize_mask_batch_partitioned(masks, codes)
    for i, c in enumerate(codes):
        single = np.asarray(
            maskproc.optimize_mask(jnp.asarray(masks[i]), names[c]))
        np.testing.assert_array_equal(part[i], single)


# ---------------------------------------------------------------------------
# tight mode (PREDICT.MASK_MODE="tight", round 4)
# ---------------------------------------------------------------------------

def cv2_optimize_watermark_tight(mask_u8):
    from unet_watermark_tpu.scripts.quality_report import (
        _cv2_optimize_watermark_mask_tight)

    return _cv2_optimize_watermark_mask_tight(
        mask_u8.astype(np.float32) / 255) * 255


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_tight_strategy_matches_cv2(seed):
    mask = _blobby_mask(np.random.default_rng(seed + 20))
    ref = cv2_optimize_watermark_tight(mask)
    ours = np.asarray(maskproc.optimize_watermark_mask_tight(
        jnp.asarray(mask.astype(np.float32) / 255)))
    mismatch = np.mean((ours > 0.5) != (ref > 127))
    assert mismatch < 0.01, mismatch  # Gaussian edge rounding only


def test_tight_mode_preserves_multiple_components():
    """Two well-separated large marks: the parity chain keeps only the
    largest; tight mode must keep both."""
    mask = np.zeros((128, 128), np.float32)
    mask[10:40, 10:40] = 1.0     # 900 px
    mask[80:120, 80:124] = 1.0   # 1760 px (largest)
    parity = np.asarray(maskproc.optimize_watermark_mask(jnp.asarray(mask)))
    tight = np.asarray(maskproc.optimize_watermark_mask_tight(
        jnp.asarray(mask)))
    assert parity[20, 20] == 0.0      # parity drops the secondary mark
    assert tight[20, 20] == 1.0       # tight keeps it
    assert tight[100, 100] == 1.0
    # tight's margin is small: total area under 2x the true marks, while
    # parity covers more than that around ONE mark alone
    assert tight.sum() < 2.0 * mask.sum()
    assert parity.sum() > tight.sum()


def test_optimize_mask_mode_dispatch():
    mask = _blobby_mask(np.random.default_rng(7)).astype(np.float32) / 255
    f = jnp.asarray(mask)
    parity = np.asarray(maskproc.optimize_mask(f, "watermark"))
    tight = np.asarray(maskproc.optimize_mask(f, "watermark", mode="tight"))
    np.testing.assert_array_equal(
        parity, np.asarray(maskproc.optimize_watermark_mask(
            jnp.asarray((mask > 0.5).astype(np.float32)))))
    np.testing.assert_array_equal(
        tight, np.asarray(maskproc.optimize_watermark_mask_tight(
            jnp.asarray((mask > 0.5).astype(np.float32)))))
    # text/mixed are mode-independent
    np.testing.assert_array_equal(
        np.asarray(maskproc.optimize_mask(f, "text", mode="tight")),
        np.asarray(maskproc.optimize_mask(f, "text")))


def test_batch_partitioned_tight_mode():
    rng = np.random.default_rng(3)
    masks = np.stack([_blobby_mask(rng).astype(np.float32) / 255
                      for _ in range(3)])
    codes = [0, 1, 0]
    out_p = maskproc.optimize_mask_batch_partitioned(masks, codes)
    out_t = maskproc.optimize_mask_batch_partitioned(masks, codes,
                                                     mode="tight")
    # text stays identical, watermark entries differ (tighter)
    np.testing.assert_array_equal(out_p[1], out_t[1])
    assert out_t[0].sum() <= out_p[0].sum()
    assert out_t[2].sum() <= out_p[2].sum()


# mask-mode resolution (PREDICT.MASK_MODE="auto", round 5)

def test_resolve_mask_mode_auto_splits_surfaces():
    assert maskproc.resolve_mask_mode("auto", "artifact") == "parity"
    assert maskproc.resolve_mask_mode("auto", "repair") == "tight"
    # explicit modes apply to both surfaces unchanged
    for mode in ("parity", "tight"):
        for surface in ("artifact", "repair"):
            assert maskproc.resolve_mask_mode(mode, surface) == mode


def test_config_default_mask_mode_is_auto():
    from unet_watermark_tpu.configs import get_cfg_defaults

    assert get_cfg_defaults().PREDICT.MASK_MODE == "auto"
