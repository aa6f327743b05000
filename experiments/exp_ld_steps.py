"""DDIM step-count sweep for the latent-diffusion rung.

exp_ld_bound.py measured 6-9 dB of headroom between the 20-step sampler
and the AE oracle bound. Steps are a free knob (no retraining): sweep
them on both protocol tiers before touching model scale.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from unet_watermark_tpu.diffusion.latent_diffusion import LatentInpainter
from unet_watermark_tpu.ops import metrics as metrics_lib
from unet_watermark_tpu.scripts.quality_report import ensure_frozen_set
from unet_watermark_tpu.training.train_inpaint import (load_clean_batches,
                                                       random_mask_batch)

WORKDIR = "/root/repo/workspace/quality"
IMG, BATCH, LIMIT = 256, 8, 16

inp = LatentInpainter()
results = {}
for tier, textured, seed in (("smooth", False, 7700),
                             ("textured", True, 7800)):
    ensure_frozen_set(WORKDIR, n=64, textured=textured)
    clean_src = os.path.join(WORKDIR,
                             "clean_src_tex" if textured else "clean_src")
    data = []
    batches = load_clean_batches(clean_src, BATCH, IMG, seed)
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(LIMIT // BATCH):
        key, sub = jax.random.split(key)
        data.append((jnp.asarray(next(batches)),
                     random_mask_batch(sub, BATCH, IMG)))
    results[tier] = {}
    for steps in (10, 20, 50, 100):
        ps = []
        for images, masks in data:
            out = inp.inpaint(np.asarray(images), np.asarray(masks),
                              steps=steps)
            ps.append(float(metrics_lib.psnr(jnp.asarray(out), images,
                                             mask=masks)))
        results[tier][f"ddim{steps}"] = round(float(np.mean(ps)), 2)
        print(tier, steps, results[tier][f"ddim{steps}"], flush=True)

with open("/root/repo/experiments/exp_ld_steps.json", "w") as f:
    json.dump(results, f, indent=1)
