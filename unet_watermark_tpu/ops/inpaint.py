"""Fast XLA inpainting: masked pyramid push-pull + Jacobi smoothing.

The reference's repair stage shells out to iopaint's LaMa/MAT networks per
folder (/root/reference/src/predict.py:771-777). This module provides the
TPU-native *fast* path: a fully-batched, jittable inpaint that fills holes
with a masked image pyramid (push-pull / pull-push algorithm) and then
relaxes the hole interior with conv-based Jacobi iterations for seamless
boundaries. It is the default engine for small/medium watermark holes and
the fallback when the learned FFC model (models/lama.py) has no weights.

Everything is static-shaped convs/reductions — one fused XLA graph, no
host round-trips, arbitrary batch.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def _downsample_masked(img: Array, w: Array) -> Tuple[Array, Array]:
    """2x2 masked average pool. img: (N,H,W,C) premultiplied by w (N,H,W,1)."""
    s = lambda x: jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID")
    wsum = s(w)
    isum = s(img)
    return isum / jnp.maximum(wsum, 1e-8) * jnp.minimum(wsum, 1.0), \
        jnp.minimum(wsum, 1.0)


def _upsample2(x: Array) -> Array:
    n, h, w, c = x.shape
    y = x[:, :, None, :, None, :]
    y = jnp.broadcast_to(y, (n, h, 2, w, 2, c))
    return y.reshape(n, h * 2, w * 2, c)


def push_pull_fill(image: Array, hole: Array) -> Array:
    """Fill holes with a pull-push pyramid.

    image: (N,H,W,C) float; hole: (N,H,W,1) 1=missing. H, W powers of two
    times >= 4 (predict pipeline pads to multiples of 32, satisfying this).
    Returns the image with holes filled by multiscale context.
    """
    n, h, w, c = image.shape
    valid = 1.0 - hole
    # pull: build masked pyramid
    levels = []
    img = image * valid
    wgt = valid
    levels.append((img, wgt))
    while (min(img.shape[1], img.shape[2]) > 2
           and img.shape[1] % 2 == 0 and img.shape[2] % 2 == 0):
        img, wgt = _downsample_masked(img, wgt)
        levels.append((img, wgt))
    # push: fill invalid regions from coarser levels
    coarse_img, coarse_w = levels[-1]
    filled = coarse_img / jnp.maximum(coarse_w, 1e-8)
    for img, wgt in reversed(levels[:-1]):
        up = _upsample2(filled)
        base = img / jnp.maximum(wgt, 1e-8)
        filled = jnp.where(wgt > 0.5, base, up)
    return jnp.where(hole > 0.5, filled, image)


@functools.partial(jax.jit, static_argnames=("iterations",))
def jacobi_smooth(image: Array, hole: Array, iterations: int = 64) -> Array:
    """Relax hole pixels toward the average of their 3x3 neighborhood
    (discrete Laplace smoothing with Dirichlet boundary = known pixels).
    Gives Poisson-like seamless blending after push-pull initialization."""
    k = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 0.0, 1.0], [1.0, 1.0, 1.0]],
                    jnp.float32) / 8.0
    kern = k[:, :, None, None]

    def avg(x):
        outs = []
        for ch in range(x.shape[-1]):
            outs.append(jax.lax.conv_general_dilated(
                x[..., ch:ch + 1], kern, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))
        return jnp.concatenate(outs, axis=-1)

    def body(_, img):
        return jnp.where(hole > 0.5, avg(img), img)

    return jax.lax.fori_loop(0, iterations, body, image)


def inpaint_pushpull(image: Array, mask: Array,
                     smooth_iterations: int = 64,
                     dilate_px: int = 0) -> Array:
    """Batched fast inpaint.

    image: (N,H,W,C) float [0,1]; mask: (N,H,W,1) or (N,H,W), 1=remove.
    """
    if mask.ndim == 3:
        mask = mask[..., None]
    hole = (mask > 0.5).astype(jnp.float32)
    if dilate_px > 0:
        hole = jax.lax.reduce_window(
            hole, -jnp.inf, jax.lax.max,
            (1, 2 * dilate_px + 1, 2 * dilate_px + 1, 1), (1, 1, 1, 1),
            "SAME")
    out = push_pull_fill(image.astype(jnp.float32), hole)
    if smooth_iterations > 0:
        out = jacobi_smooth(out, hole, smooth_iterations)
    return jnp.clip(out, 0.0, 1.0)
