"""Reduced-resolution inference tier: quality + throughput on 512-squared inputs.

The predict pipeline already resizes any input to cfg.DATA.IMG_SIZE and
resizes the probability map back to the original size before thresholding
(inference/predict.py:273) -- exactly what the reference does for arbitrary
input sizes (/root/reference/src/predict.py predict_mask resize round-trip).
That makes IMG_SIZE a zero-code *inference tier knob*: a 512-squared image
processed at 384 does (384/512)^2 = 56% of the FLOPs.

This experiment qualifies the knob on the frozen held-out protocol
(seeds 7700/7701, 512-squared ground truth -- the SAME metric space as the
shipped tiers in docs/QUALITY.md) and times the full product-equivalent
graph on the chip:

  quality : wm512 --host downscale--> res --model--> probs --host upscale-->
            512 --threshold--> IoU/F1 vs the 512 GT masks
  timing  : jitted [B,512,512,3] -> device resize -> normalize -> model ->
            sigmoid -> device upsample to 512 -> threshold -> per-image
            counts (chained dispatches, like bench.py)

so the throughput number is honest img/s on 512-squared INPUTS, including
both resizes, not a smaller-image benchmark.

Usage: python experiments/exp_lowres_tier.py [--timing-only|--quality-only]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

WORK = "/root/repo/workspace/quality"
LIMIT = 64
BATCH = 128
RESOLUTIONS = (384,)   # @320 measured ~10pt IoU cost in round 4 — dismissed
CONFIGS = (
    # (model, quant)
    ("Unet", True),
    ("Unet", False),
    ("UnetPlusPlus", True),
)
# timing is restricted to the tier worth publishing (quality results:
# @384 costs ~5pt IoU on every config, @320 ~10pt -- see the log);
# UNet-int8@384 is the only candidate fast tier
TIMING_CONFIGS = (("Unet", True),)
TIMING_RESOLUTIONS = (384,)


def eval_lowres_quality(model_name: str, res: int, quant: bool,
                        textured: bool = False) -> dict:
    """Held-out raw IoU/F1 measured at 512 GT after the product's
    downscale -> forward -> prob-upscale round trip."""
    import cv2
    import jax
    import jax.numpy as jnp

    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model
    from unet_watermark_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD
    from unet_watermark_tpu.scripts.quality_report import (
        _load_triads, ensure_frozen_set)
    from unet_watermark_tpu.utils.shipping import load_variables, resolve

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = res
    cfg.MODEL.NAME = model_name
    model = create_model_from_config(cfg)
    variables = init_model(model, res, seed=0)
    path = resolve("seg", cfg=cfg)
    assert path and os.path.exists(path), f"no weights for {model_name}"
    variables = load_variables(path, variables)
    thr = cfg.PREDICT.THRESHOLD

    quant_scales = None
    if quant:
        from unet_watermark_tpu.ops.quant import load_scales
        from unet_watermark_tpu.scripts.calibrate_quant import (
            quant_sidecar_path)
        quant_scales = load_scales(quant_sidecar_path(path))

    def apply_model(norm):
        if quant_scales:
            from unet_watermark_tpu.ops.quant import quant_int8
            with quant_int8(quant_scales):
                return model.apply(variables, norm, train=False)
        return model.apply(variables, norm, train=False)

    @jax.jit
    def fwd_probs(x01):
        norm = (x01 - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        return jax.nn.sigmoid(apply_model(norm)[..., 0])

    root = ensure_frozen_set(WORK, n=LIMIT, textured=textured)
    nonlocal_vals = [0.0, 0.0, 0.0]   # tp, fp, fn
    buf_small, buf_gt = [], []

    def flush():
        if not buf_small:
            return
        x = jnp.asarray(np.stack(buf_small), jnp.float32) / 255.0
        probs = np.asarray(fwd_probs(x))
        for p, gt in zip(probs, buf_gt):
            up = cv2.resize(p, (512, 512))          # product: predict.py:273
            pred = up > thr
            tp_ = float(np.sum(pred & gt))
            fp_ = float(np.sum(pred & ~gt))
            fn_ = float(np.sum(~pred & gt))
            nonlocal_vals[0] += tp_
            nonlocal_vals[1] += fp_
            nonlocal_vals[2] += fn_
        buf_small.clear()
        buf_gt.clear()

    for _, wm, _, mk in _load_triads(root, LIMIT, 512):
        buf_small.append(cv2.resize(wm, (res, res)))  # product downscale
        buf_gt.append(mk > 127)
        if len(buf_small) == 8:
            flush()
    flush()
    tp, fp, fn = nonlocal_vals
    iou = tp / max(tp + fp + fn, 1e-7)
    prec = tp / max(tp + fp, 1e-7)
    rec = tp / max(tp + fn, 1e-7)
    f1 = 2 * prec * rec / max(prec + rec, 1e-7)
    return {"iou": round(iou, 4), "f1": round(f1, 4)}


def time_lowres(model_name: str, res: int, quant: bool) -> float:
    """Chained-dispatch throughput of the full product-equivalent graph on
    [B,512,512,3] inputs processed at `res`."""
    import jax
    import jax.numpy as jnp

    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model
    from unet_watermark_tpu.ops.augment import IMAGENET_MEAN, IMAGENET_STD
    from unet_watermark_tpu.utils.jaxtools import enable_compile_cache

    enable_compile_cache()
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = res
    cfg.MODEL.NAME = model_name
    model = create_model_from_config(cfg)
    variables = init_model(model, res, seed=0)
    thr = cfg.PREDICT.THRESHOLD

    quant_scales = None
    if quant:
        from unet_watermark_tpu.ops.quant import load_scales
        from unet_watermark_tpu.scripts.calibrate_quant import (
            quant_sidecar_path)
        from unet_watermark_tpu.utils.shipping import resolve
        quant_scales = load_scales(quant_sidecar_path(resolve("seg", cfg=cfg)))

    def apply_model(norm):
        if quant_scales:
            from unet_watermark_tpu.ops.quant import quant_int8
            with quant_int8(quant_scales):
                return model.apply(variables, norm, train=False)
        return model.apply(variables, norm, train=False)

    @jax.jit
    def step(images512):
        small = jax.image.resize(
            images512, (images512.shape[0], res, res, 3), "linear")
        norm = (small - IMAGENET_MEAN) / IMAGENET_STD
        probs = jax.nn.sigmoid(apply_model(norm)[..., 0])
        up = jax.image.resize(
            probs, (probs.shape[0], 512, 512), "linear")
        counts = jnp.sum(up > thr, axis=(1, 2)).astype(jnp.float32)
        ratio = jnp.mean(counts) / (512.0 * 512.0)
        scale = 1.0 + ratio % 0.003 + 0.004   # bounded chain perturbation
        return images512 * scale, counts

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((BATCH, 512, 512, 3)), jnp.float32)
    t0 = time.time()
    x, c = step(x)
    c.block_until_ready()
    print(f"  compile {time.time() - t0:.0f}s", flush=True)
    for _ in range(3):
        x, c = step(x)
    c.block_until_ready()
    iters = 20
    t0 = time.time()
    for _ in range(iters):
        x, c = step(x)
    c.block_until_ready()
    dt = (time.time() - t0) / iters
    return BATCH / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timing-only", action="store_true")
    ap.add_argument("--quality-only", action="store_true")
    args = ap.parse_args()

    import jax
    print("device:", jax.devices()[0].device_kind, flush=True)

    if not args.timing_only:
        # round-5: qualify on BOTH frozen protocol tiers (the round-4
        # qualification was smooth-only — VERDICT r4 task 8)
        for model_name, quant in CONFIGS:
            tag = f"{model_name}{'-int8' if quant else '-bf16'}"
            for res in RESOLUTIONS:
                for tier in ("smooth", "textured"):
                    q = eval_lowres_quality(model_name, res, quant,
                                            textured=tier == "textured")
                    print(f"{tag} @{res} [{tier}]: held-out raw IoU "
                          f"{q['iou']:.4f} F1 {q['f1']:.4f}", flush=True)
    if not args.quality_only:
        for model_name, quant in TIMING_CONFIGS:
            tag = f"{model_name}{'-int8' if quant else '-bf16'}"
            for res in TIMING_RESOLUTIONS:
                rate = time_lowres(model_name, res, quant)
                print(f"{tag} @{res}: {rate:.1f} 512^2-img/s (b{BATCH})",
                      flush=True)


if __name__ == "__main__":
    main()
