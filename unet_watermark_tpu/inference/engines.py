"""Inpainting engine registry.

The reference dispatches repair to iopaint by model name ('lama', 'mat',
…) via subprocess/batch_inpaint (/root/reference/src/predict.py:771-777,
src/cli.py:154). Here engines are in-process, batched, jitted device
functions with one interface:

    engine(images (N,H,W,3) f32 [0,1], masks (N,H,W,1) {0,1}) -> images

Available:
  * "pushpull"  — ops/inpaint.py multiscale fill (no weights needed; the
                  default and the fallback)
  * "lama" / "big-lama" / "mat" — models/lama.py FFC generator; uses
                  trained weights from a checkpoint if provided, else
                  falls back to pushpull with a warning (LaMa's public
                  torch weights are runtime downloads the reference does;
                  zero-egress TPU pods can't).
"""
from __future__ import annotations

import functools
import logging
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.inpaint import inpaint_pushpull

logger = logging.getLogger(__name__)

Engine = Callable


@functools.lru_cache(maxsize=8)
def _pushpull_jit(smooth_iterations: int = 64):
    return jax.jit(lambda im, mk: inpaint_pushpull(
        im, mk, smooth_iterations=smooth_iterations))


def _make_lama_engine(variant: str, weights_path: Optional[str]):
    from ..models.lama import create_lama, init_lama

    model = create_lama(variant)
    variables = None
    if weights_path and os.path.exists(weights_path):
        import orbax.checkpoint as ocp

        template = init_lama(model)
        ckptr = ocp.StandardCheckpointer()
        variables = ckptr.restore(os.path.abspath(weights_path), template)
        logger.info("loaded %s weights from %s", variant, weights_path)
    if variables is None:
        logger.warning(
            "no trained weights for inpaint model '%s' — falling back to "
            "the pushpull engine (train one with training/train_inpaint.py "
            "and set PREDICT_INPAINT_WEIGHTS)", variant)
        return _pushpull_jit()

    @jax.jit
    def engine(images, masks):
        return model.apply(variables, images, masks, train=False)

    return engine


def get_engine(name: str = "pushpull",
               weights_path: Optional[str] = None) -> Engine:
    name = (name or "pushpull").lower()
    if name in ("pushpull", "fast", "telea"):
        return _pushpull_jit()
    if name in ("lama", "big-lama", "mat"):
        wp = weights_path or os.environ.get("PREDICT_INPAINT_WEIGHTS")
        return _make_lama_engine(name, wp)
    raise ValueError(f"unknown inpaint engine '{name}'")
