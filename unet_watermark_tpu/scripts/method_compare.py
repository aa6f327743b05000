"""Per-method mask comparison report.

Analog of the reference's manual harness
/root/reference/src/text/test_text_watermark.py:57-128, which runs five
prediction variants on an image and saves each mask, a matplotlib
comparison grid, and a metrics table. This version drives the real
WatermarkPredictor variants:

  1. standard       — predict_mask(type='watermark')
  2. text           — text-feature enhancement + text morphology
  3. mixed          — mixed-type morphology
  4. multi_scale    — MULTI_SCALE_TEST over PREDICT.TEST_SCALES
  5. raw            — plain threshold, no post-processing

If a ground-truth mask is given (or found as <stem>_mask.png next to the
image), per-method IoU/F1/precision/recall are computed with the jitted
ops/metrics reductions and written to metrics.txt.

CLI:
    python -m unet_watermark_tpu.scripts.method_compare \
        --image img.jpg --model ckpt --output out/ [--gt-mask mask.png]
"""
from __future__ import annotations

import argparse
import logging
import os
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)

METHODS = ("standard", "text", "mixed", "multi_scale", "raw")


def run_methods(predictor, image_path: str) -> Dict[str, np.ndarray]:
    """Run all five prediction variants; returns {method: uint8 mask}."""
    cfg = predictor.cfg
    out: Dict[str, np.ndarray] = {}
    saved = (cfg.PREDICT.MULTI_SCALE_TEST, cfg.PREDICT.POST_PROCESS)
    try:
        cfg.PREDICT.MULTI_SCALE_TEST = False
        cfg.PREDICT.POST_PROCESS = True
        out["standard"] = predictor.predict_mask(image_path, "watermark")
        out["text"] = predictor.predict_mask(image_path, "text")
        out["mixed"] = predictor.predict_mask(image_path, "mixed")
        cfg.PREDICT.MULTI_SCALE_TEST = True
        out["multi_scale"] = predictor.predict_mask(image_path, "watermark")
        cfg.PREDICT.MULTI_SCALE_TEST = False
        cfg.PREDICT.POST_PROCESS = False
        out["raw"] = predictor.predict_mask(image_path, "watermark")
    finally:
        cfg.PREDICT.MULTI_SCALE_TEST, cfg.PREDICT.POST_PROCESS = saved
    return out


def score_masks(masks: Dict[str, np.ndarray],
                gt_mask: np.ndarray) -> Dict[str, Dict[str, float]]:
    import jax.numpy as jnp

    from ..ops import metrics as M

    gt = jnp.asarray((gt_mask > 127).astype(np.float32))[None, ..., None]
    scores = {}
    for name, mk in masks.items():
        pred = jnp.asarray((mk > 127).astype(np.float32))[None, ..., None]
        # confusion_stats expects logits; map binary {0,1} → {-1,+1}
        stats = M.confusion_stats(pred * 2.0 - 1.0, gt)
        m = M.metrics_from_stats(stats)
        scores[name] = {
            "iou": float(m["iou"]),
            "f1": float(m["f1"]),
            "precision": float(m["precision"]),
            "recall": float(m["recall"]),
            "coverage": float(pred.mean()),
        }
    return scores


def save_report(image_path: str, masks: Dict[str, np.ndarray],
                output_dir: str,
                scores: Optional[Dict[str, Dict[str, float]]] = None) -> str:
    """Write per-method masks, a comparison grid PNG, and metrics.txt."""
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    stem = os.path.splitext(os.path.basename(image_path))[0]
    for name, mk in masks.items():
        cv2.imwrite(os.path.join(output_dir, f"{stem}_{name}_mask.png"), mk)

    # comparison grid: original + each method (matplotlib, Agg)
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    img = cv2.cvtColor(cv2.imread(image_path), cv2.COLOR_BGR2RGB)
    n = 1 + len(masks)
    cols = 3
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows))
    axes = np.atleast_1d(axes).ravel()
    axes[0].imshow(img)
    axes[0].set_title("original")
    for ax, (name, mk) in zip(axes[1:], masks.items()):
        ax.imshow(mk, cmap="gray")
        title = name
        if scores and name in scores:
            title += f"  IoU {scores[name]['iou']:.3f}"
        ax.set_title(title)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    grid_path = os.path.join(output_dir, f"{stem}_method_comparison.png")
    fig.savefig(grid_path, dpi=110)
    plt.close(fig)

    if scores:
        lines = [f"{'method':<12} {'IoU':>7} {'F1':>7} {'prec':>7} "
                 f"{'recall':>7} {'cover':>7}"]
        for name, s in scores.items():
            lines.append(f"{name:<12} {s['iou']:7.4f} {s['f1']:7.4f} "
                         f"{s['precision']:7.4f} {s['recall']:7.4f} "
                         f"{s['coverage']:7.4f}")
        with open(os.path.join(output_dir, f"{stem}_metrics.txt"), "w") as f:
            f.write("\n".join(lines) + "\n")
        logger.info("\n%s", "\n".join(lines))
    return grid_path


def compare_methods(image_path: str, output_dir: str,
                    model_path: Optional[str] = None,
                    config_path: Optional[str] = None,
                    gt_mask_path: Optional[str] = None) -> Dict:
    from ..inference.predict import WatermarkPredictor

    predictor = WatermarkPredictor(model_path=model_path,
                                   config_path=config_path)
    masks = run_methods(predictor, image_path)

    if gt_mask_path is None:
        stem = os.path.splitext(image_path)[0]
        for cand in (stem + "_mask.png", stem + ".mask.png"):
            if os.path.exists(cand):
                gt_mask_path = cand
                break
    scores = None
    if gt_mask_path and os.path.exists(gt_mask_path):
        import cv2

        gt = cv2.imread(gt_mask_path, cv2.IMREAD_GRAYSCALE)
        if gt is not None:
            if gt.shape != masks["standard"].shape:
                gt = cv2.resize(gt, masks["standard"].shape[::-1],
                                interpolation=cv2.INTER_NEAREST)
            scores = score_masks(masks, gt)
    grid = save_report(image_path, masks, output_dir, scores)
    return {"masks": {k: v for k, v in masks.items()},
            "scores": scores, "grid": grid}


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser(
        description="per-method mask comparison report")
    p.add_argument("--image", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--model", default=None)
    p.add_argument("--config", default=None)
    p.add_argument("--gt-mask", default=None)
    args = p.parse_args(argv)
    r = compare_methods(args.image, args.output, args.model, args.config,
                        args.gt_mask)
    print(f"report: {r['grid']}")


if __name__ == "__main__":
    main()
