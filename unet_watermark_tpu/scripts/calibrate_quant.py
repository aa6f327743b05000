"""Calibrate int8 activation scales for a shipped segmentation model.

The int8 inference tier (ops/quant.py — the TPU-native analog of the
reference's quantized backend variant, /root/reference/src/flux/
flux_process_nunchaku.py:23) needs one amax per conv input. This script
generates a small procedural calibration set (training-lineage seeds,
disjoint from the frozen 7700/7701 held-out protocol), runs the model
eagerly in observe mode, and writes the scales as a JSON sidecar next to
the resolved weights file:

    weights/seg_unet_resnet34.npz  ->  weights/seg_unet_resnet34.quant.json

    python -m unet_watermark_tpu.scripts.calibrate_quant \
        --model Unet --encoder resnet34 [--batches 4] [--img-size 512]

Observe mode needs concrete values, so the forward runs UNJITTED; use
--backend cpu (default) to keep the few hundred eager dispatches off the
device tunnel.
"""
from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

CALIB_CLEAN_SEED = 4242
CALIB_COMPOSE_SEED = 4243


def calibration_batches(workdir: str, n_images: int, img_size: int,
                        batch: int):
    """Yield normalized fp32 NHWC batches from a procedural calibration
    set (clean + composited watermarks, the training distribution)."""
    import cv2

    from ..data.gen_data import generate_dataset
    from ..data.synth_clean import generate_clean_dataset, generate_logo_set
    from ..ops.augment import IMAGENET_MEAN, IMAGENET_STD

    clean_src = os.path.join(workdir, "calib_clean_v2")
    logos = os.path.join(workdir, "calib_logos")
    # v2: 50/50 smooth+textured calibration distribution. Versioned dir
    # so a pre-existing smooth-only calib_set (round 3) cannot silently
    # satisfy the count guard and recalibrate on the old distribution.
    root = os.path.join(workdir, "calib_set_v2")
    wm_dir = os.path.join(root, "watermarked")
    if not (os.path.isdir(wm_dir) and len(os.listdir(wm_dir)) >= n_images):
        # 50/50 smooth+textured — the round-4 training distribution, so
        # activation amax covers textured inputs too (docs/QUALITY.md).
        generate_clean_dataset(clean_src, count=max(8, n_images // 2),
                               size=img_size, seed=CALIB_CLEAN_SEED,
                               texture_ratio=0.5)
        generate_logo_set(logos, count=8, seed=CALIB_CLEAN_SEED + 1)
        generate_dataset(clean_src, root, logos_dir=logos, count=n_images,
                         seed=CALIB_COMPOSE_SEED)
    names = sorted(os.listdir(wm_dir))[:n_images]
    mean = np.asarray(IMAGENET_MEAN, np.float32)
    std = np.asarray(IMAGENET_STD, np.float32)
    for i in range(0, len(names), batch):
        imgs = []
        for name in names[i:i + batch]:
            rgb = cv2.cvtColor(cv2.imread(os.path.join(wm_dir, name)),
                               cv2.COLOR_BGR2RGB)
            if rgb.shape[0] != img_size:
                rgb = cv2.resize(rgb, (img_size, img_size))
            imgs.append(rgb.astype(np.float32) / 255.0)
        yield (np.stack(imgs) - mean) / std


def calibrate(model_name: str = "Unet", encoder: str = "resnet34",
              weights: Optional[str] = None, img_size: int = 512,
              n_images: int = 16, batch: int = 4,
              workdir: str = "workspace/calib",
              out: Optional[str] = None, backend: str = "cpu") -> str:
    """Run observe-mode calibration; returns the sidecar path written."""
    import jax

    from ..configs import get_cfg_defaults
    from ..models import create_model_from_config, init_model
    from ..ops import quant
    from ..utils.shipping import load_variables, resolve

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = img_size
    cfg.MODEL.NAME = model_name
    cfg.MODEL.ENCODER_NAME = encoder
    model = create_model_from_config(cfg)
    variables = init_model(model, img_size, seed=0)
    path = resolve("seg", cfg=cfg, explicit=weights)
    if not path or not os.path.exists(path):
        raise FileNotFoundError(
            f"no segmentation weights resolve for {model_name}/{encoder}; "
            f"train or pass --weights")
    variables = load_variables(path, variables)

    store: dict = {}
    try:
        device = jax.local_devices(backend=backend)[0]
    except RuntimeError:
        device = jax.devices()[0]
    with jax.default_device(device):
        with quant.quant_observe(store):
            for xb in calibration_batches(workdir, n_images, img_size,
                                          batch):
                model.apply(variables, xb, train=False)
    if not store:
        raise RuntimeError("observe pass recorded no conv paths — does the "
                           "model route convs through conv2d_maybe_quant?")
    sidecar = out or quant_sidecar_path(path)
    # bind the sidecar to the exact checkpoint (round 3's red shipping
    # gate was a sidecar/checkpoint mismatch; ship_gate.py verifies this)
    quant.save_scales(sidecar, store,
                      meta={"weights_sha256": file_sha256(path)})
    logger.info("wrote %d scales to %s", len(store), sidecar)
    return sidecar


def file_sha256(path: str) -> str:
    import hashlib

    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def quant_sidecar_path(weights_path: str) -> str:
    """Scales sidecar convention: <weights stem>.quant.json."""
    return os.path.splitext(weights_path)[0] + ".quant.json"


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="Unet")
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--workdir", default="workspace/calib")
    ap.add_argument("--out", default=None)
    ap.add_argument("--backend", default="cpu",
                    help="jax backend for the eager observe pass")
    args = ap.parse_args(argv)
    sidecar = calibrate(args.model, args.encoder, weights=args.weights,
                        img_size=args.img_size, n_images=args.images,
                        batch=args.batch, workdir=args.workdir,
                        out=args.out, backend=args.backend)
    print(sidecar)


if __name__ == "__main__":
    main()
