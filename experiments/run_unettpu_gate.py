"""Ship gate for the UnetTPU lane-aligned tier (round-4 verdict task 3).

UnetTPU is a new architecture with no shipped predecessor, so the
cross-model rule applies: it ships as the performance tier if its raw
IoU is within 1 point of the shipped Unet speed tier on BOTH frozen
protocol tiers (smooth + textured) — the "≤1 pt raw-IoU cost" bar the
round-4 verdict set for the ≥4,000 img/s architecture lever. On pass,
ship with:

  cp <candidate> unet_watermark_tpu/weights/seg_unettpu_resnet34.npz
  python -m unet_watermark_tpu.scripts.calibrate_quant --model UnetTPU

Usage: python experiments/run_unettpu_gate.py --candidate <npz> \
           [--limit 64] [--out experiments/gate_r5_unettpu.log]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from unet_watermark_tpu.scripts.quality_report import (
        ensure_frozen_set, eval_segmentation)

    ap = argparse.ArgumentParser()
    ap.add_argument("--candidate", required=True)
    ap.add_argument("--limit", type=int, default=64)
    ap.add_argument("--workdir", default="workspace/quality")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    out = {}
    for tier in ("smooth", "textured"):
        root = ensure_frozen_set(args.workdir, textured=tier == "textured")
        out[tier] = {}
        for tag, model_name, weights in (
                ("unet_shipped", "Unet", None),
                ("unettpu_candidate", "UnetTPU", args.candidate)):
            r = eval_segmentation(root, args.limit, weights=weights,
                                  model_name=model_name, encoder="resnet34")
            if "error" in r:
                sys.exit(f"{tier}/{tag}: {r['error']}")
            out[tier][tag] = r["raw"]
    out["ship"] = all(
        out[t]["unettpu_candidate"]["iou"]
        >= out[t]["unet_shipped"]["iou"] - 0.01
        for t in ("smooth", "textured"))
    text = json.dumps(out, indent=1, default=float)
    print(text)
    if args.out:
        with open(args.out, "w") as f:
            f.write(text + "\n")


if __name__ == "__main__":
    main()
