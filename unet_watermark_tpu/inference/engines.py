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
  * "diffusion" — diffusion/latent_diffusion.py native latent-diffusion
                  inpainter (the in-framework analog of the reference's
                  SD3/FLUX backends); pushpull fallback when untrained.
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


def load_lama_variables(weights_path: str, variant: str = "lama"):
    """Load an FFC-LaMa checkpoint (bf16 .npz or orbax dir — the format
    split is handled by utils/shipping.load_variables) into whichever
    lama variant's parameter tree matches. A checkpoint trained as one
    variant serves the other engine names too (the reference's lama/mat
    split is a quality knob, not a weight format): the requested depth is
    tried first, then the others. Returns (model, variables, name) or
    (None, None, None) when no variant's template matches.

    This is the ONE lama-weights code path — shared by get_engine and the
    fused repair graph (predict.make_fused_repair_fn), so the two can
    never disagree about what loads (the round-2 bug: the fused path had
    its own orbax-only restore that silently dropped the shipped .npz)."""
    from ..models.lama import create_lama, init_lama
    from ..utils.shipping import load_variables

    if weights_path.endswith((".pt", ".pth", ".ckpt")):
        # public big-lama torch checkpoint (the file the reference's
        # iopaint downloads at runtime, predict.py:771-777) — route to
        # the faithful-structure importer (models/lama_import.py)
        from ..models.lama_import import load_big_lama
        try:
            model, variables, _ = load_big_lama(weights_path)
            logger.info("imported big-lama torch checkpoint %s",
                        weights_path)
            return model, variables, "big-lama-torch"
        except Exception as e:  # noqa: BLE001 — fall through to warning
            logger.warning("torch inpaint checkpoint %s failed to import "
                           "as big-lama: %s", weights_path, e)
            return None, None, None

    for cand in dict.fromkeys((variant, "lama", "big-lama")):
        m = create_lama(cand)
        try:
            variables = load_variables(weights_path, init_lama(m))
            logger.info("loaded %s weights from %s (as '%s')",
                        variant, weights_path, cand)
            return m, variables, cand
        except Exception:  # noqa: BLE001 — template/tree mismatch
            continue
    logger.warning("checkpoint %s matches no lama variant", weights_path)
    return None, None, None


def _make_lama_engine(variant: str, weights_path: Optional[str]):
    model = variables = None
    if weights_path and os.path.exists(weights_path):
        model, variables, _ = load_lama_variables(weights_path, variant)
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
    """The shipped FFC-LaMa checkpoint (trained in-framework by
    training/train_inpaint.py), through the unified registry
    (utils/shipping.resolve). None if absent."""
    from ..utils.shipping import resolve

    return resolve("inpaint")


def resolve_inpaint_weights(explicit: Optional[str] = None,
                            cfg=None) -> Optional[str]:
    """Precedence: explicit arg > PREDICT.INPAINT_WEIGHTS config key >
    PREDICT_INPAINT_WEIGHTS env > shipped default. Thin alias of
    utils/shipping.resolve('inpaint', …) kept for API stability."""
    from ..utils.shipping import resolve

    return resolve("inpaint", cfg=cfg, explicit=explicit)


def _make_diffusion_engine(weights_path: Optional[str]):
    """The native latent-diffusion inpainter as a registry engine
    (images, masks) -> images. Falls back to pushpull (with a warning)
    when no trained diffusion weights resolve — same contract as lama."""
    from ..diffusion.latent_diffusion import LatentInpainter

    try:
        inpainter = LatentInpainter(weights_path)
    except FileNotFoundError:
        logger.warning(
            "no trained weights for the diffusion engine — falling back "
            "to pushpull (train with training/train_latent_diffusion.py)")
        return _pushpull_jit()

    def engine(images, masks):
        return jnp.asarray(inpainter.inpaint(images, masks))

    return engine


def get_engine(name: str = "pushpull",
               weights_path: Optional[str] = None,
               cfg=None) -> Engine:
    name = (name or "pushpull").lower()
    if name in ("pushpull", "fast", "telea"):
        return _pushpull_jit()
    if name in ("lama", "big-lama", "mat"):
        return _make_lama_engine(name, resolve_inpaint_weights(
            weights_path, cfg))
    if name in ("diffusion", "latent-diffusion", "ld"):
        return _make_diffusion_engine(weights_path)
    raise ValueError(f"unknown inpaint engine '{name}'")
