"""A/B: geometric vs OCR-refined text-mask labels (gen_data use_ocr_mask).

Generates the SAME text-tier watermarked images twice (identical seeds)
with geometric alpha-footprint masks and with the OCR-refined pass
(ref gen_data.py:352-366), then scores the shipped segmentation model's
raw predictions against each label set. The label set the detector
agrees with more is the better training target for the text tier.
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

from unet_watermark_tpu.data.gen_data import generate_dataset
from unet_watermark_tpu.data.synth_clean import generate_clean_dataset
from unet_watermark_tpu.scripts.quality_report import eval_segmentation

WORK = "/root/repo/workspace/ocr_ab"
N = 32
SEED_CLEAN, SEED_COMPOSE = 9100, 9101  # reserved for this A/B only

clean_src = os.path.join(WORK, "clean")
generate_clean_dataset(clean_src, count=16, size=512, seed=SEED_CLEAN)
out = {}
for tag, use_ocr in (("geometric", False), ("ocr_refined", True)):
    root = os.path.join(WORK, tag)
    generate_dataset(clean_src, root, logos_dir=None, count=N,
                     ratios={"text": 1.0}, seed=SEED_COMPOSE,
                     use_ocr_mask=use_ocr)
    r = eval_segmentation(root, limit=N, batch=4, model_name="Unet",
                          encoder="resnet34")
    out[tag] = {"raw": r["raw"], "pipeline": r["pipeline"],
                "n_images": r["n_images"]}
    print(tag, json.dumps(out[tag]), flush=True)

with open("/root/repo/experiments/exp_ocr_mask_ab.json", "w") as f:
    json.dump(out, f, indent=1)
