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
        # a checkpoint trained as one variant serves the other engine names
        # too (the reference's lama/mat split is a quality knob, not a
        # weight format): try the requested depth first, fall back across
        # variants whose template matches the stored tree.
        is_npz = os.path.isfile(weights_path) and weights_path.endswith(
            ".npz")
        if not is_npz:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
        for cand in dict.fromkeys((variant, "lama", "big-lama")):
            m = create_lama(cand)
            try:
                template = init_lama(m)
                if is_npz:
                    from ..utils.shipping import load_params_npz

                    variables = load_params_npz(weights_path, template)
                else:
                    variables = ckptr.restore(
                        os.path.abspath(weights_path), dict(template))
                model = m
                logger.info("loaded %s weights from %s (as '%s')",
                            variant, weights_path, cand)
                break
            except Exception:  # noqa: BLE001 — template/tree mismatch
                continue
        if variables is None:
            logger.warning("checkpoint %s matches no lama variant",
                           weights_path)
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


def default_inpaint_weights() -> Optional[str]:
    """The shipped FFC-LaMa checkpoint, trained in-framework by
    training/train_inpaint.py. Checked in order:
      1. unet_watermark_tpu/weights/lama_ffc  (tracked, ships with the repo)
      2. <repo>/models/lama_ffc               (legacy round-1 location)
    None if absent."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    repo = os.path.dirname(pkg)
    for path in (os.path.join(pkg, "weights", "lama_ffc.npz"),
                 os.path.join(pkg, "weights", "lama_ffc"),
                 os.path.join(repo, "models", "lama_ffc")):
        if os.path.exists(path):
            return path
    return None


def resolve_inpaint_weights(explicit: Optional[str] = None,
                            cfg=None) -> Optional[str]:
    """Precedence: explicit arg > PREDICT.INPAINT_WEIGHTS config key >
    PREDICT_INPAINT_WEIGHTS env > shipped default under models/lama_ffc."""
    for cand in (explicit,
                 getattr(getattr(cfg, "PREDICT", None), "INPAINT_WEIGHTS",
                         None),
                 os.environ.get("PREDICT_INPAINT_WEIGHTS")):
        if cand:
            return cand
    return default_inpaint_weights()


def get_engine(name: str = "pushpull",
               weights_path: Optional[str] = None,
               cfg=None) -> Engine:
    name = (name or "pushpull").lower()
    if name in ("pushpull", "fast", "telea"):
        return _pushpull_jit()
    if name in ("lama", "big-lama", "mat"):
        return _make_lama_engine(name, resolve_inpaint_weights(
            weights_path, cfg))
    raise ValueError(f"unknown inpaint engine '{name}'")
