"""Binary morphology + Gaussian blur as XLA ops.

Replaces the cv2 (C++) morphology the reference's mask post-processing leans
on (/root/reference/src/predict.py:161-301, src/utils/dataset.py:197-296):
getStructuringElement(ELLIPSE/RECT), erode/dilate/open/close with
iterations, GaussianBlur, threshold. Everything here is jittable, batched,
and stays on device — masks are (..., H, W) float32 in {0,1}.

Semantics match cv2:
  * ELLIPSE kernels are generated with cv2's exact algorithm
  * MORPH_OPEN with iterations=n is erode^n then dilate^n (not open^n) —
    cv2's documented behavior
  * dilate treats the border as 0, erode as 1 (cv2's default border values
    for binary masks)

Dilate/erode are expressed as a 2D convolution with the structuring element
followed by a compare — a single fused MXU/VPU op per step, instead of the
gather-based neighborhood max a naive port would use.
"""
from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=64)
def ellipse_kernel(width: int, height: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (width, height)) parity.

    Reimplements OpenCV's ellipse rasterization (modules/imgproc/src/
    morph.cpp): inscribe an ellipse with integer anchor at
    (width//2, height//2).
    """
    anchor_x, anchor_y = width // 2, height // 2
    r, c = anchor_y, anchor_x
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    kernel = np.zeros((height, width), np.float32)
    for i in range(height):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(c * math.sqrt(max(r * r - dy * dy, 0) * inv_r2)))
            j1 = max(c - dx, 0)
            j2 = min(c + dx + 1, width)
            kernel[i, j1:j2] = 1.0
    return kernel


@functools.lru_cache(maxsize=64)
def rect_kernel(width: int, height: int) -> np.ndarray:
    """cv2.getStructuringElement(cv2.MORPH_RECT, (width, height))."""
    return np.ones((height, width), np.float32)


def get_structuring_element(shape: str, ksize: Tuple[int, int]) -> np.ndarray:
    w, h = ksize
    if shape == "ellipse":
        return ellipse_kernel(w, h)
    if shape == "rect":
        return rect_kernel(w, h)
    if shape == "cross":
        k = np.zeros((h, w), np.float32)
        k[h // 2, :] = 1.0
        k[:, w // 2] = 1.0
        return k
    raise ValueError(f"unknown structuring element shape '{shape}'")


def _to_nhwc(x: Array):
    """Normalize (...,H,W) to (N,H,W,1); return restore fn."""
    orig_shape = x.shape
    if x.ndim == 2:
        y = x[None, :, :, None]
    elif x.ndim == 3:
        y = x[:, :, :, None]
    elif x.ndim == 4:
        y = x
    else:
        raise ValueError(f"expected 2-4 dims, got {x.shape}")

    def restore(z):
        return z.reshape(orig_shape)

    return y, restore


def _conv2d(x: Array, kernel: np.ndarray) -> Array:
    k = jnp.asarray(kernel, jnp.float32)[:, :, None, None]  # HWIO
    kh, kw = kernel.shape
    # cv2 anchors at (w//2, h//2): pad (anchor, size-1-anchor) per axis.
    pad = [(kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)]
    return jax.lax.conv_general_dilated(
        x.astype(jnp.float32), k, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def dilate(mask: Array, kernel: np.ndarray, iterations: int = 1) -> Array:
    """Binary dilation; border treated as 0 (cv2 default for dilate)."""
    x, restore = _to_nhwc(mask)
    x = (x > 0.5).astype(jnp.float32)
    for _ in range(iterations):
        x = (_conv2d(x, kernel) > 0.5).astype(jnp.float32)
    return restore(x)


def erode(mask: Array, kernel: np.ndarray, iterations: int = 1) -> Array:
    """Binary erosion; border treated as 1 (cv2 default for erode).

    erode(x) == NOT dilate(NOT x) with zero-border — one conv per step.
    """
    x, restore = _to_nhwc(mask)
    x = (x > 0.5).astype(jnp.float32)
    for _ in range(iterations):
        x = 1.0 - (_conv2d(1.0 - x, kernel) > 0.5).astype(jnp.float32)
    return restore(x)


def morph_open(mask: Array, kernel: np.ndarray, iterations: int = 1) -> Array:
    """cv2.morphologyEx(MORPH_OPEN, iterations=n) = erode^n → dilate^n."""
    return dilate(erode(mask, kernel, iterations), kernel, iterations)


def morph_close(mask: Array, kernel: np.ndarray, iterations: int = 1) -> Array:
    """cv2.morphologyEx(MORPH_CLOSE, iterations=n) = dilate^n → erode^n."""
    return erode(dilate(mask, kernel, iterations), kernel, iterations)


def morph_gradient(mask: Array, kernel: np.ndarray) -> Array:
    """cv2 MORPH_GRADIENT = dilate - erode (used by sd3/inpaint.py:86)."""
    return dilate(mask, kernel) - erode(mask, kernel)


@functools.lru_cache(maxsize=64)
def gaussian_kernel_1d(ksize: int, sigma: float) -> np.ndarray:
    """cv2.getGaussianKernel parity.

    cv2 uses fixed small-kernel tables for ksize<=7 with sigma<=0; for
    sigma>0 it is the sampled, normalized Gaussian below (identical math).
    """
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    half = (ksize - 1) * 0.5
    xs = np.arange(ksize, dtype=np.float64) - half
    k = np.exp(-(xs * xs) / (2.0 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(img: Array, ksize: Tuple[int, int], sigma: float,
                  sigma_y: float = None) -> Array:
    """cv2.GaussianBlur with BORDER_REFLECT_101 (cv2 default border).

    Separable: two 1D convs fused by XLA.
    """
    kw, kh = ksize
    sigma_y = sigma if sigma_y is None else sigma_y
    kx = gaussian_kernel_1d(kw, sigma)
    ky = gaussian_kernel_1d(kh, sigma_y)
    x, restore = _to_nhwc(img)
    x = x.astype(jnp.float32)
    # reflect-101 padding, then VALID convs
    ph, pw = kh // 2, kw // 2
    x = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)), mode="reflect")
    # HIGHEST precision: keep fp32 multiplies on TPU (default would drop the
    # conv to bf16 and break cv2 parity at the ~0.5% level).
    kyj = jnp.asarray(ky)[:, None, None, None]
    x = jax.lax.conv_general_dilated(
        x, kyj, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    kxj = jnp.asarray(kx)[None, :, None, None]
    x = jax.lax.conv_general_dilated(
        x, kxj, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST)
    return restore(x)


def threshold_binary(img: Array, thresh: float, maxval: float = 1.0) -> Array:
    """cv2.threshold(..., THRESH_BINARY): > thresh → maxval else 0."""
    return jnp.where(img > thresh, jnp.float32(maxval), jnp.float32(0.0))
