"""Text-watermark trainer — analog of
/root/reference/src/text/train_text_watermark.py.

Specialized training entry for thin-stroke text masks: the text config
(unet_text_watermark.yaml — AdamW, CosineAnnealingWarmRestarts, combined
loss with focal+edge terms, text_watermark augmentation policy) plus
text-oriented synthetic data generation. The reference version had drifted
against its own utils (SURVEY.md §2.3 #46: imports a removed
calculate_metrics and an old dataset signature); this implementation wires
the current training stack instead.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, Optional

logger = logging.getLogger(__name__)

TEXT_CONFIG = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "unet_text_watermark.yaml")


class TextWatermarkTrainer:
    """train_text_watermark.py:34-390 analog."""

    def __init__(self, config_path: Optional[str] = None,
                 data_root: Optional[str] = None,
                 output_dir: str = "logs/text_watermark_output"):
        from ..configs import get_cfg_defaults, update_config

        self.cfg = get_cfg_defaults()
        update_config(self.cfg, config_path or TEXT_CONFIG)
        if data_root:
            self.cfg.DATA.ROOT_DIR = data_root
        self.cfg.TRAIN.OUTPUT_DIR = output_dir

    def generate_training_data(self, clean_dir: str, count: int = 500,
                               seed: int = 42) -> Dict:
        """Text-heavy synthetic data (text 0.7 / mixed 0.3)."""
        from ..data.gen_data import generate_dataset

        return generate_dataset(
            clean_dir, self.cfg.DATA.ROOT_DIR, logos_dir=None, count=count,
            ratios={"text": 0.7, "mixed": 0.3, "logo": 0.0, "multi": 0.0},
            seed=seed)

    def train(self, resume_from: Optional[str] = None,
              epochs: Optional[int] = None,
              max_steps_per_epoch: Optional[int] = None) -> Dict:
        from ..training import train

        cfg = self.cfg.clone()
        if epochs is not None:
            cfg.TRAIN.EPOCHS = epochs
        return train(cfg, resume_from=resume_from,
                     max_steps_per_epoch=max_steps_per_epoch)

    def evaluate_methods(self, image_path: str, output_dir: str,
                         model_path: Optional[str] = None) -> Dict:
        """Per-method mask comparison report — the
        test_text_watermark.py:57-128 harness as an API: runs the
        watermark/text/mixed strategies on one image, saves each mask and
        a side-by-side grid."""
        import cv2
        import numpy as np

        from ..inference import WatermarkPredictor

        os.makedirs(output_dir, exist_ok=True)
        predictor = WatermarkPredictor(model_path=model_path,
                                       config=self.cfg)
        results = {}
        masks = {}
        for method in ("watermark", "text", "mixed"):
            mask = predictor.predict_mask(image_path, mask_type=method)
            p = os.path.join(output_dir, f"mask_{method}.png")
            cv2.imwrite(p, mask)
            masks[method] = mask
            results[method] = {
                "mask_path": p,
                "coverage": float((mask > 0).mean()),
                "components": int(cv2.connectedComponents(
                    (mask > 0).astype(np.uint8))[0]) - 1,
            }
        # comparison grid
        img = cv2.imread(image_path)
        h, w = img.shape[:2]
        row = [img] + [cv2.cvtColor(m, cv2.COLOR_GRAY2BGR)
                       for m in masks.values()]
        grid = np.concatenate([cv2.resize(r, (w, h)) for r in row], axis=1)
        grid_path = os.path.join(output_dir, "comparison_grid.png")
        cv2.imwrite(grid_path, grid)
        results["grid"] = grid_path
        return results


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="text watermark trainer")
    p.add_argument("--config", default=None)
    p.add_argument("--data-root", default=None)
    p.add_argument("--clean-dir", default=None,
                   help="generate text training data from these images")
    p.add_argument("--samples", type=int, default=500)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--resume", default=None)
    args = p.parse_args(argv)
    trainer = TextWatermarkTrainer(config_path=args.config,
                                   data_root=args.data_root)
    if args.clean_dir:
        print(trainer.generate_training_data(args.clean_dir, args.samples))
    result = trainer.train(resume_from=args.resume, epochs=args.epochs)
    print({"best_val_loss": result["best_val_loss"],
           "epochs_run": result["epochs_run"]})


if __name__ == "__main__":
    main()
