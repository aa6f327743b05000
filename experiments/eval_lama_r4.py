"""Shipped vs retrained FFC-LaMa on both frozen protocol tiers.

The round-3 shipped generator trains on the smooth procedural corpus and
loses end-to-end to push-pull there (docs/QUALITY.md). The round-4
candidate (workspace/lama_r4/ckpt.npz) fine-tunes it on a 50/50
smooth+textured corpus (seed 55). Decision rule for shipping the
candidate: it must win or tie the shipped generator on BOTH tiers' hole
protocol and beat push-pull end-to-end on the textured tier.
Runs on CPU (backend-independent numerics).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from unet_watermark_tpu.scripts.inpaint_quality import evaluate_engines
from unet_watermark_tpu.scripts.quality_report import (
    ensure_frozen_set, eval_e2e_repair)

WORKDIR = "/root/repo/workspace/quality"
CAND = "/root/repo/workspace/lama_r4/ckpt.npz"
SHIPPED = "/root/repo/unet_watermark_tpu/weights/lama_ffc.npz"

out = {}
for tier, textured in (("smooth", False), ("textured", True)):
    root = ensure_frozen_set(WORKDIR, n=64, textured=textured)
    clean_src = os.path.join(WORKDIR,
                             "clean_src_tex" if textured else "clean_src")
    seed = 7800 if textured else 7700
    tier_out = {}
    tier_out["hole_shipped"] = evaluate_engines(
        clean_src, ["pushpull", "lama"], limit=32, seed=seed,
        weights_path=SHIPPED)
    tier_out["hole_candidate"] = evaluate_engines(
        clean_src, ["lama"], limit=32, seed=seed, weights_path=CAND)
    os.environ.pop("PREDICT_INPAINT_WEIGHTS", None)
    tier_out["e2e_shipped"] = eval_e2e_repair(root, limit=32)
    os.environ["PREDICT_INPAINT_WEIGHTS"] = CAND
    tier_out["e2e_candidate"] = eval_e2e_repair(root, limit=32)
    os.environ.pop("PREDICT_INPAINT_WEIGHTS", None)
    out[tier] = tier_out
    print(tier, json.dumps(tier_out, indent=1), flush=True)

with open("/root/repo/experiments/eval_lama_r4.json", "w") as f:
    json.dump(out, f, indent=1)
