"""Inpainting hole-quality evaluation: PSNR/SSIM per engine.

No reference counterpart — the reference never measures fill quality (it
ships iopaint-LaMa and eyeballs videos). This tool makes the repair-engine
choice measurable: take held-out clean images, punch LaMa-recipe random
holes, fill them with each engine, and score hole-region PSNR and
whole-image SSIM against the ground truth.

    python -m unet_watermark_tpu.scripts.inpaint_quality \
        --clean-dir workspace/eval/clean --img-size 256 --limit 32
"""
from __future__ import annotations

import argparse
import json
import logging
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def evaluate_engines(clean_dir: str, engines: List[str],
                     img_size: int = 256, batch_size: int = 8,
                     limit: int = 32, seed: int = 0,
                     weights_path: Optional[str] = None) -> Dict:
    from ..inference.engines import get_engine, resolve_inpaint_weights
    from ..ops import metrics as metrics_lib
    from ..training.train_inpaint import load_clean_batches, random_mask_batch

    batches = load_clean_batches(clean_dir, batch_size, img_size, seed)
    n_batches = max(1, limit // batch_size)
    data = []
    key = jax.random.PRNGKey(seed + 1)
    for i in range(n_batches):
        key, sub = jax.random.split(key)
        images = jnp.asarray(next(batches))
        masks = random_mask_batch(sub, batch_size, img_size)
        data.append((images, masks))

    psnr_j = jax.jit(lambda a, b, m: metrics_lib.psnr(a, b, mask=m))
    ssim_j = jax.jit(metrics_lib.ssim)

    results = {}
    for name in engines:
        engine = get_engine(name, weights_path=weights_path)
        psnrs, ssims = [], []
        for images, masks in data:
            out = engine(images, masks)
            psnrs.append(float(psnr_j(out, images, masks)))
            ssims.append(float(ssim_j(out, images)))
        results[name] = {
            "hole_psnr_db": round(float(np.mean(psnrs)), 2),
            "ssim": round(float(np.mean(ssims)), 4),
            "n_images": n_batches * batch_size,
        }
        logger.info("%s: hole PSNR %.2f dB, SSIM %.4f", name,
                    results[name]["hole_psnr_db"], results[name]["ssim"])
    results["weights"] = resolve_inpaint_weights(weights_path)
    return results


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache

    logging.basicConfig(level=logging.INFO, force=True)
    enable_compile_cache()
    p = argparse.ArgumentParser(description="inpaint hole-quality eval")
    p.add_argument("--clean-dir", required=True)
    p.add_argument("--engines", nargs="+", default=["pushpull", "lama"])
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--limit", type=int, default=32)
    p.add_argument("--weights", type=str, default=None)
    p.add_argument("--output", type=str, default=None,
                   help="write results JSON here")
    args = p.parse_args(argv)
    r = evaluate_engines(args.clean_dir, args.engines, args.img_size,
                         args.batch_size, args.limit,
                         weights_path=args.weights)
    print(json.dumps(r, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(r, f, indent=2)


if __name__ == "__main__":
    main()
