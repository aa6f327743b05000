"""Golden tests: XLA morphology vs cv2 (SURVEY.md §7 layer 3)."""
import cv2
import numpy as np
import pytest

from unet_watermark_tpu.ops import morphology as m


def _rand_mask(rng, h=64, w=64, p=0.3):
    return (rng.random((h, w)) < p).astype(np.uint8) * 255


@pytest.mark.parametrize("size", [(2, 2), (3, 3), (4, 4), (5, 5), (7, 7),
                                  (9, 9), (11, 11), (5, 1), (1, 5)])
def test_ellipse_kernel_matches_cv2(size):
    ours = m.ellipse_kernel(*size)
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, size)
    np.testing.assert_array_equal(ours.astype(np.uint8), ref)


@pytest.mark.parametrize("ksize,iters", [((3, 3), 1), ((7, 7), 3),
                                         ((11, 11), 2), ((9, 9), 2),
                                         ((4, 4), 1)])
def test_dilate_matches_cv2(rng, ksize, iters):
    mask = _rand_mask(rng)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, ksize)
    ref = cv2.dilate(mask, kernel, iterations=iters)
    ours = np.asarray(m.dilate(mask.astype(np.float32) / 255.0,
                               m.ellipse_kernel(*ksize), iters))
    np.testing.assert_array_equal((ours > 0.5).astype(np.uint8) * 255, ref)


@pytest.mark.parametrize("ksize,iters", [((3, 3), 1), ((5, 5), 2)])
def test_erode_matches_cv2(rng, ksize, iters):
    mask = _rand_mask(rng, p=0.7)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, ksize)
    ref = cv2.erode(mask, kernel, iterations=iters)
    ours = np.asarray(m.erode(mask.astype(np.float32) / 255.0,
                              m.ellipse_kernel(*ksize), iters))
    np.testing.assert_array_equal((ours > 0.5).astype(np.uint8) * 255, ref)


@pytest.mark.parametrize("op,cv_op", [(m.morph_open, cv2.MORPH_OPEN),
                                      (m.morph_close, cv2.MORPH_CLOSE)])
@pytest.mark.parametrize("ksize,iters", [((3, 3), 1), ((7, 7), 3),
                                         ((11, 11), 2), ((2, 2), 1)])
def test_open_close_matches_cv2(rng, op, cv_op, ksize, iters):
    mask = _rand_mask(rng, p=0.45)
    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, ksize)
    ref = cv2.morphologyEx(mask, cv_op, kernel, iterations=iters)
    ours = np.asarray(op(mask.astype(np.float32) / 255.0,
                         m.ellipse_kernel(*ksize), iters))
    np.testing.assert_array_equal((ours > 0.5).astype(np.uint8) * 255, ref)


def test_rect_kernels_directional(rng):
    """The text-mask path uses (5,1)/(1,5) RECT closes (predict.py:200-208)."""
    mask = _rand_mask(rng, p=0.4)
    for size in [(5, 1), (1, 5)]:
        kernel = cv2.getStructuringElement(cv2.MORPH_RECT, size)
        ref = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel, iterations=1)
        ours = np.asarray(m.morph_close(mask.astype(np.float32) / 255.0,
                                        m.rect_kernel(*size), 1))
        np.testing.assert_array_equal((ours > 0.5).astype(np.uint8) * 255, ref)


def test_gaussian_blur_close_to_cv2(rng):
    img = (rng.random((32, 32)) * 255).astype(np.float32)
    ref = cv2.GaussianBlur(img, (3, 3), 0.5)
    ours = np.asarray(m.gaussian_blur(img, (3, 3), 0.5))
    assert np.max(np.abs(ours - ref)) < 1e-2


def test_gaussian_then_threshold_matches_reference_smooth(rng):
    """Final smoothing of the watermark mask path (predict.py:268-271):
    GaussianBlur (3,3,0.5) then threshold at 127."""
    mask = _rand_mask(rng, p=0.5).astype(np.float32)
    ref_b = cv2.GaussianBlur(mask, (3, 3), 0.5)
    _, ref = cv2.threshold(ref_b.astype(np.uint8), 127, 255,
                           cv2.THRESH_BINARY)
    ours_b = np.asarray(m.gaussian_blur(mask / 255.0, (3, 3), 0.5))
    ours = np.asarray(m.threshold_binary(ours_b, 127.5 / 255.0))
    mismatch = np.mean((ours > 0.5) != (ref > 127))
    assert mismatch < 0.01  # sub-1% disagreement from float rounding at 127
