"""Latent-diffusion rung: oracle upper bound vs push-pull.

The DDIM sampler composes its output as decode(z-fill) inside the hole
(diffusion/latent_diffusion.py:250-254), so NO denoiser — however big or
long-trained — can beat the autoencoder's own reconstruction blended
into the hole: bound = hole-PSNR of decode(encode(clean)). If that
bound sits below push-pull's hole PSNR, the engine ranking is decided
by the AE scale, not the diffusion model, and the round-3 "scale the
denoiser / lengthen the schedule" hypothesis is dead on arrival.
Measured on both frozen protocol tiers with the protocol's own masks.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from unet_watermark_tpu.diffusion.latent_diffusion import (LatentInpainter,
                                                           TinyAutoencoder)
from unet_watermark_tpu.ops import metrics as metrics_lib
from unet_watermark_tpu.scripts.quality_report import ensure_frozen_set
from unet_watermark_tpu.training.train_inpaint import (load_clean_batches,
                                                       random_mask_batch)

WORKDIR = "/root/repo/workspace/quality"
IMG, BATCH, LIMIT = 256, 8, 32

inp = LatentInpainter()
ae_v = {"params": inp.variables["ae"]}


@jax.jit
def oracle(images, masks):
    z0 = inp.ae.apply(ae_v, images, method=TinyAutoencoder.encode)
    out = inp.ae.apply(ae_v, z0, method=TinyAutoencoder.decode)
    m3 = jnp.broadcast_to(masks, images.shape)
    return out * m3 + images * (1 - m3)


results = {}
for tier, textured, seed in (("smooth", False, 7700),
                             ("textured", True, 7800)):
    ensure_frozen_set(WORKDIR, n=64, textured=textured)
    clean_src = os.path.join(WORKDIR,
                             "clean_src_tex" if textured else "clean_src")
    batches = load_clean_batches(clean_src, BATCH, IMG, seed)
    key = jax.random.PRNGKey(seed + 1)
    bound_psnrs, dd_psnrs = [], []
    for _ in range(LIMIT // BATCH):
        key, sub = jax.random.split(key)
        images = jnp.asarray(next(batches))
        masks = random_mask_batch(sub, BATCH, IMG)
        ob = oracle(images, masks)
        bound_psnrs.append(float(metrics_lib.psnr(ob, images, mask=masks)))
        dd = inp.inpaint(np.asarray(images), np.asarray(masks), steps=20)
        dd_psnrs.append(float(metrics_lib.psnr(
            jnp.asarray(dd), images, mask=masks)))
    results[tier] = {
        "oracle_bound_hole_psnr_db": round(float(np.mean(bound_psnrs)), 2),
        "ddim20_hole_psnr_db": round(float(np.mean(dd_psnrs)), 2),
    }
    print(tier, results[tier], flush=True)

with open("/root/repo/experiments/exp_ld_bound.json", "w") as f:
    json.dump(results, f, indent=1)
