"""Pallas kernel: the full watermark mask-optimization morphology chain in
one VMEM-resident pass.

The XLA implementation (inference/maskproc.py:optimize_watermark_mask)
lowers to ~14 sequential convs — open(3), close(7)x3, close(11)x2,
dilate(9)x2, Gaussian — each round-tripping the 512² mask through HBM. A
512² fp32 mask is 1 MB; VMEM is ~16 MB/core, so the WHOLE chain fits
on-chip: this kernel loads the mask once, applies every
dilate/erode/blur step as shifted-max/sum VPU ops on a padded VMEM
scratch buffer, and writes the result once.

Semantics match ops/morphology exactly (cv2 parity):
  * elliptical structuring elements from morphology.ellipse_kernel
  * erode(x) = 1 - dilate(1 - x)  (cv2 border conventions)
  * open(k, n) = erode^n → dilate^n; close = the reverse
The padded scratch absorbs dilation growth (accumulated radius 48 < 64-pad)
so circular pltpu.roll wraparound never touches the image region.

Grid: one program per batch element. The connected-component stage between
morphology and the final smooth stays in XLA (it is a global iterative
algorithm); see maskproc.optimize_watermark_mask_pallas for the composed
pipeline.
"""
from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..morphology import ellipse_kernel, gaussian_kernel_1d

PAD = 64  # > accumulated dilation radius of the watermark chain (48)


def _offsets(kernel: np.ndarray) -> List[Tuple[int, int]]:
    """(dy, dx) taps of a structuring element, anchored like cv2."""
    kh, kw = kernel.shape
    ay, ax = kh // 2, kw // 2
    out = []
    for y in range(kh):
        for x in range(kw):
            if kernel[y, x] > 0:
                out.append((y - ay, x - ax))
    return out


def _shift(x, dy: int, dx: int):
    """Circular roll; the PAD ring guarantees wrapped values land in (and
    only affect) the pad region. pltpu.roll requires non-negative shifts —
    normalize modulo the axis size."""
    y = x
    if dy:
        y = pltpu.roll(y, (-dy) % y.shape[0], 0)
    if dx:
        y = pltpu.roll(y, (-dx) % y.shape[1], 1)
    return y


def _dilate_inplace(buf, offsets):
    acc = buf
    for dy, dx in offsets:
        if dy == 0 and dx == 0:
            continue
        acc = jnp.maximum(acc, _shift(buf, dy, dx))
    return acc


def _make_chain_kernel(size: int, steps: Sequence[Tuple[str, np.ndarray, int]],
                       gaussian: bool):
    """steps: list of (op, structuring_element, iterations) with op in
    {dilate, erode}; open/close are expressed as their primitive pairs."""
    pad_size = size + 2 * PAD
    step_offsets = [(op, _offsets(k), iters) for op, k, iters in steps]
    g1d = gaussian_kernel_1d(3, 0.5).astype(np.float32)

    def kernel(in_ref, out_ref, scratch):
        scratch[:] = jnp.zeros((pad_size, pad_size), jnp.float32)
        scratch[PAD:PAD + size, PAD:PAD + size] = (
            in_ref[0] > 0.5).astype(jnp.float32)
        x = scratch[:]
        # indicator of the image extent: cv2 clips every morphology output
        # to the image and treats outside-image as 0 for dilate / 1 for
        # erode; multiplying by `inside` after each primitive reproduces
        # both conventions (erode via complement stays inside-only).
        ys = jax.lax.broadcasted_iota(jnp.int32, (pad_size, pad_size), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (pad_size, pad_size), 1)
        inside = ((ys >= PAD) & (ys < PAD + size) &
                  (xs >= PAD) & (xs < PAD + size)).astype(jnp.float32)
        for op, offs, iters in step_offsets:
            for _ in range(iters):
                if op == "dilate":
                    x = _dilate_inplace(x, offs) * inside
                else:  # erode = complement(inside)-dilate-complement
                    c = (1.0 - x) * inside
                    x = (1.0 - _dilate_inplace(c, offs)) * inside
        if gaussian:
            # separable 3x3 gaussian(σ=0.5) + binary threshold at 0.5
            gy = (g1d[0] * _shift(x, -1, 0) + g1d[1] * x +
                  g1d[2] * _shift(x, 1, 0))
            gx = (g1d[0] * _shift(gy, 0, -1) + g1d[1] * gy +
                  g1d[2] * _shift(gy, 0, 1))
            x = (gx > 0.5).astype(jnp.float32)
        out_ref[0] = x[PAD:PAD + size, PAD:PAD + size]

    return kernel, pad_size


@functools.lru_cache(maxsize=8)
def _build(size: int, chain_name: str):
    if chain_name == "watermark_pre":
        # predict.py:231-250: open(3) → close(7)x3 → close(11)x2 →
        # dilate(9)x2 (CC + final smooth handled outside)
        steps = [
            ("erode", ellipse_kernel(3, 3), 1),
            ("dilate", ellipse_kernel(3, 3), 1),
            ("dilate", ellipse_kernel(7, 7), 3),
            ("erode", ellipse_kernel(7, 7), 3),
            ("dilate", ellipse_kernel(11, 11), 2),
            ("erode", ellipse_kernel(11, 11), 2),
            ("dilate", ellipse_kernel(9, 9), 2),
        ]
        gaussian = False
    elif chain_name == "smooth":
        steps = []
        gaussian = True
    else:
        raise ValueError(chain_name)
    kernel, pad_size = _make_chain_kernel(size, steps, gaussian)

    def call(masks, interpret: bool = False):
        n = masks.shape[0]
        return pl.pallas_call(
            kernel,
            grid=(n,),
            in_specs=[pl.BlockSpec((1, size, size),
                                   lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, size, size), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n, size, size), jnp.float32),
            scratch_shapes=[pltpu.VMEM((pad_size, pad_size), jnp.float32)],
            interpret=interpret,
        )(masks)

    return call


def _interpret() -> bool:
    """Pallas TPU kernels need interpret mode off-TPU (CPU tests)."""
    return jax.default_backend() not in ("tpu", "axon")


def morph_chain_watermark(masks: jax.Array) -> jax.Array:
    """(N, S, S) binary masks → morphology-chain output (before CC),
    matching maskproc's open/close/dilate sequence exactly."""
    n, s1, s2 = masks.shape
    assert s1 == s2, "square masks only"
    return _build(s1, "watermark_pre")(masks.astype(jnp.float32),
                                       interpret=_interpret())


def gaussian_smooth_threshold(masks: jax.Array) -> jax.Array:
    """(N, S, S): GaussianBlur(3,3,0.5) + threshold 0.5, in VMEM."""
    n, s1, s2 = masks.shape
    return _build(s1, "smooth")(masks.astype(jnp.float32),
                                interpret=_interpret())
