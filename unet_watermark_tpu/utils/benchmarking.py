"""Shared chained-dispatch benchmark harness.

This environment's device tunnel dedups repeated identical dispatches,
which fakes microbenchmarks (docs/PERFORMANCE.md "Measurement validity").
Every throughput measurement therefore chains iterations: the next
iteration's input is perturbed by a data-dependent scalar so no two
dispatch payloads are identical. The perturbation is ZERO-MEAN and
bounded (|scale - 1| <= 0.0015), so chained inputs stay inside the
int8-calibrated activation range instead of drifting upward (the
pre-round-4 harness used `1.004 + ratio % 0.003`, strictly > 1, ~8%
growth over 20 iters — see ADVICE.md round 3).

Used by bench.py and experiments/exp_int8_*.py so there is exactly one
copy of the measurement-validity logic.
"""
from __future__ import annotations

import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def make_chained_forward(apply_fn: Callable, threshold: float = 0.5):
    """Wrap a logits-producing forward into a chained timing step.

    `apply_fn(images) -> logits` is the model forward (already closed
    over variables / quant context). Returns a jitted
    `images -> (next_images, counts)` where `counts` is the per-image
    watermark pixel count — the scalar the repair pipeline branches on
    (reference predict.py:690 ratio rule) — so the timing includes mask
    extraction without a 512²-per-image D2H copy.
    """

    @jax.jit
    def forward_chained(images):
        logits = apply_fn(images)
        counts = jnp.sum(jax.nn.sigmoid(logits) > threshold,
                         axis=(1, 2, 3))
        # The perturbation must flip bits even after the model's bf16
        # cast (bf16 eps = 2^-8), else the dispatch content is identical
        # and the tunnel dedups it. Mod a bounded quantity — the mean
        # mask ratio in [0,1] — not the raw pixel count (~1e5-1e7, where
        # float32 ulp exceeds the 0.003 modulus). Zero-mean: inputs stay
        # in the calibrated activation range across chained iterations.
        ratio = jnp.sum(counts).astype(jnp.float32) / (
            images.shape[0] * images.shape[1] * images.shape[2])
        scale = 1.0 + (ratio % 0.003) - 0.0015
        return images * scale, counts

    return forward_chained


def time_chained(fwd: Callable, x: jax.Array,
                 iters: int = 20) -> Tuple[float, float]:
    """Compile, then time `iters` chained steps.

    Returns (compile_seconds, seconds_per_iter).
    """
    t0 = time.time()
    out = fwd(x)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    x = out[0]
    t0 = time.time()
    for _ in range(iters):
        x, aux = fwd(x)
    jax.block_until_ready((x, aux))
    return compile_s, (time.time() - t0) / iters
