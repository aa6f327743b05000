"""Pallas VMEM morphology chain vs the XLA reference ops (interpret mode
on the CPU mesh; compiled path exercised on TPU by bench/perf runs)."""
import numpy as np
import pytest

import jax.numpy as jnp

from unet_watermark_tpu.inference import maskproc
from unet_watermark_tpu.ops import morphology as m
from unet_watermark_tpu.ops.pallas.morph_chain import (
    gaussian_smooth_threshold,
    morph_chain_watermark,
)


def _masks(seed=0, n=2, s=128, p=0.35):
    rng = np.random.default_rng(seed)
    return (rng.random((n, s, s)) < p).astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1])
def test_chain_matches_xla_ops(seed):
    masks = _masks(seed)
    ours = np.asarray(morph_chain_watermark(jnp.asarray(masks)))
    x = jnp.asarray(masks)
    x = m.morph_open(x, m.ellipse_kernel(3, 3), 1)
    x = m.morph_close(x, m.ellipse_kernel(7, 7), 3)
    x = m.morph_close(x, m.ellipse_kernel(11, 11), 2)
    x = m.dilate(x, m.ellipse_kernel(9, 9), 2)
    np.testing.assert_array_equal(ours, np.asarray(x))


def test_smooth_matches_xla():
    masks = _masks(3, p=0.5)
    ours = np.asarray(gaussian_smooth_threshold(jnp.asarray(masks)))
    ref = np.asarray(m.threshold_binary(
        m.gaussian_blur(jnp.asarray(masks), (3, 3), 0.5), 0.5))
    np.testing.assert_array_equal(ours, ref)


def test_full_pipeline_matches_maskproc():
    masks = _masks(5, n=2, s=96, p=0.4)
    ours = np.asarray(
        maskproc.optimize_watermark_mask_batch_pallas(jnp.asarray(masks)))
    ref = np.stack([
        np.asarray(maskproc.optimize_watermark_mask(jnp.asarray(mk)))
        for mk in masks])
    np.testing.assert_array_equal(ours, ref)


def test_edge_masks_stay_inside():
    """Foreground touching the border must not leak or wrap."""
    mask = np.zeros((1, 96, 96), np.float32)
    mask[0, :10, :10] = 1.0
    mask[0, -10:, -10:] = 1.0
    out = np.asarray(morph_chain_watermark(jnp.asarray(mask)))
    assert out.shape == (1, 96, 96)
    assert set(np.unique(out)).issubset({0.0, 1.0})
    # parity with XLA ops at the borders specifically
    x = jnp.asarray(mask)
    x = m.morph_open(x, m.ellipse_kernel(3, 3), 1)
    x = m.morph_close(x, m.ellipse_kernel(7, 7), 3)
    x = m.morph_close(x, m.ellipse_kernel(11, 11), 2)
    x = m.dilate(x, m.ellipse_kernel(9, 9), 2)
    np.testing.assert_array_equal(out, np.asarray(x))
