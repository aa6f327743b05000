"""Watermark triage — analog of
/root/reference/src/scripts/watermark_filter.py.

Runs the segmentation model over a folder and moves images WITHOUT a
detected watermark (ratio < 0.001, watermark_filter.py:194) out of the
training set. Batched on device instead of per-image."""
from __future__ import annotations

import argparse
import logging
import os
import shutil
from typing import Dict, List, Optional

import cv2
import numpy as np

logger = logging.getLogger(__name__)

RATIO_THRESHOLD = 0.001  # watermark_filter.py:194


class WatermarkFilter:
    def __init__(self, model_path: Optional[str] = None, config=None,
                 config_path: Optional[str] = None,
                 threshold: float = RATIO_THRESHOLD):
        from ..inference import WatermarkPredictor

        self.threshold = threshold
        self.predictor = WatermarkPredictor(
            model_path=model_path, config=config, config_path=config_path)

    def has_watermark(self, image_path: str) -> bool:
        """watermark_filter.py:173-199 analog."""
        mask = self.predictor.predict_mask(image_path)
        return (mask > 0).mean() >= self.threshold

    def filter_folder(self, input_dir: str, clean_output_dir: str,
                      move: bool = True, limit: Optional[int] = None
                      ) -> Dict:
        os.makedirs(clean_output_dir, exist_ok=True)
        files = sorted(
            os.path.join(input_dir, f) for f in os.listdir(input_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp",
                                   ".webp")))
        if limit:
            files = files[:limit]
        moved: List[str] = []
        kept = 0
        # batched: reuse the predictor's step1 machinery at model res
        s = self.predictor.img_size
        bs = self.predictor.cfg.PREDICT.BATCH_SIZE
        for i in range(0, len(files), bs):
            chunk = files[i:i + bs]
            imgs = []
            ok = []
            for p in chunk:
                img = cv2.imread(p)
                if img is None:
                    continue
                rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                imgs.append(cv2.resize(rgb, (s, s)).astype(np.float32) / 255)
                ok.append(p)
            if not ok:
                continue
            batch = np.stack(imgs)
            if batch.shape[0] < bs:
                batch = np.concatenate([
                    batch, np.zeros((bs - batch.shape[0], s, s, 3),
                                    np.float32)])
            probs = self.predictor._forward_probs(batch)[:len(ok)]
            for j, p in enumerate(ok):
                ratio = float(
                    (probs[j] > self.predictor.cfg.PREDICT.THRESHOLD).mean())
                if ratio < self.threshold:
                    dest = os.path.join(clean_output_dir,
                                        os.path.basename(p))
                    if move:
                        shutil.move(p, dest)
                    else:
                        shutil.copy2(p, dest)
                    moved.append(dest)
                else:
                    kept += 1
        summary = {"total": len(files), "with_watermark": kept,
                   "clean_moved": len(moved), "moved_files": moved}
        logger.info("filter: %d total, %d watermarked, %d clean moved",
                    len(files), kept, len(moved))
        return summary


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="watermark triage filter")
    p.add_argument("--model", required=True)
    p.add_argument("--config", default=None)
    p.add_argument("--input", required=True)
    p.add_argument("--clean-output", required=True)
    p.add_argument("--copy", action="store_true",
                   help="copy instead of move")
    args = p.parse_args(argv)
    f = WatermarkFilter(model_path=args.model, config_path=args.config)
    s = f.filter_folder(args.input, args.clean_output, move=not args.copy)
    print({k: v for k, v in s.items() if k != "moved_files"})


if __name__ == "__main__":
    main()
