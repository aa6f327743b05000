"""Round-4 ship gate for the mixed-corpus (50/50 smooth+textured)
fine-tuned segmentation weights (experiments/run_seg_r5.py stage 3).

Evaluates candidate vs shipped weights on BOTH frozen protocol tiers
(seeds 7700/7701 smooth, 7800/7801 textured — docs/QUALITY.md) and
prints one JSON verdict. Ship rule: smooth raw IoU within 0.02 of the
shipped weights AND textured raw IoU strictly improves.

    python experiments/run_seg_r6_gate.py \
        --candidate workspace/ft_upp/seg_unetplusplus_resnet34.npz \
        --model UnetPlusPlus [--limit 32]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unet_watermark_tpu.scripts.quality_report import (  # noqa: E402
    ensure_frozen_set, eval_segmentation)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate", required=True)
    ap.add_argument("--model", default="UnetPlusPlus")
    ap.add_argument("--encoder", default="resnet34")
    ap.add_argument("--limit", type=int, default=32)
    ap.add_argument("--workdir", default="workspace/quality")
    args = ap.parse_args()

    out = {}
    for tier in ("smooth", "textured"):
        root = ensure_frozen_set(args.workdir, textured=tier == "textured")
        out[tier] = {}
        for tag, weights in (("shipped", None), ("candidate", args.candidate)):
            r = eval_segmentation(root, args.limit, weights=weights,
                                  model_name=args.model,
                                  encoder=args.encoder)
            if "error" in r:
                sys.exit(f"{tier}/{tag}: {r['error']}")
            out[tier][tag] = r["raw"]
    smooth_ok = (out["smooth"]["candidate"]["iou"]
                 >= out["smooth"]["shipped"]["iou"] - 0.02)
    tex_ok = (out["textured"]["candidate"]["iou"]
              > out["textured"]["shipped"]["iou"])
    out["ship"] = bool(smooth_ok and tex_ok)
    print(json.dumps(out, indent=1, default=float))


if __name__ == "__main__":
    main()
