"""Shipping decision for the round-4 mixed-corpus seg retrains.

Scores a candidate checkpoint (orbax best_model dir or npz) against the
shipped weights on BOTH frozen protocol tiers. Ship only if the smooth
tier holds (raw IoU within ~0.01) and the textured tier improves
substantially (shipped weights collapse there: raw IoU ~0.10).

    python experiments/eval_seg_r5.py <model> <candidate_path>
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from unet_watermark_tpu.scripts.quality_report import (ensure_frozen_set,
                                                       eval_segmentation)

model = sys.argv[1] if len(sys.argv) > 1 else "UnetPlusPlus"
cand = sys.argv[2] if len(sys.argv) > 2 else \
    "/root/repo/workspace/seg_r5/ckpt/best_model"

out = {}
for tier, textured in (("smooth", False), ("textured", True)):
    root = ensure_frozen_set("/root/repo/workspace/quality", n=64,
                             textured=textured)
    for tag, weights in (("shipped", None), ("candidate", cand)):
        r = eval_segmentation(root, limit=64, batch=8, model_name=model,
                              encoder="resnet34", weights=weights)
        key = f"{tier}/{tag}"
        out[key] = {"weights": r.get("weights"), "raw": r.get("raw"),
                    "pipeline_tight": r.get("pipeline_tight")}
        print(key, json.dumps({"raw": r.get("raw")}), flush=True)

name = f"/root/repo/experiments/eval_seg_r5_{model.lower()}.json"
with open(name, "w") as f:
    json.dump(out, f, indent=1)
print("wrote", name)
