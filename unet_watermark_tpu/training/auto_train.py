"""Self-improving training loop — analog of /root/reference/src/auto_train.py.

Each cycle (auto_train.py:492-553):
  1. model selection  — best checkpoint by detection rate (vmapped
                        multi-checkpoint eval, scripts/model_selector.py)
  2. training         — resume from best, +K epochs (auto_train.py:143-199)
  3. prediction       — repair pipeline over the test folder (:201-256)
  4. video            — comparison video of the cycle's outputs (:258-304)
  5. data augmentation— grow the training set ~20% with ratio-controlled
                        watermark types (:306-490; transparent .6, multi .4,
                        text .3, mixed .2 at :350-372)

Failures are isolated per cycle (auto_train.py:561-567): a failing step
logs, writes its cycle_info.json, and the loop continues. A final_report
aggregates all cycles (:579).
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Dict, List, Optional

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class AutoTrainConfig:
    project_root: str = "."
    config_path: str = ""
    max_cycles: int = 100
    epochs_per_cycle: int = 50
    batch_size: int = 8
    learning_rate: float = 0.001
    output_dir: str = "models/auto"
    samples: int = 1000
    prediction_limit: int = 100
    transparent_ratio: float = 0.6
    multi_watermark_ratio: float = 0.4
    text_watermark_ratio: float = 0.5
    mixed_watermark_ratio: float = 0.2
    data_growth: float = 0.2           # +20% per cycle (auto_train.py:306)
    train_data_dir: str = "data/train"
    test_data_dir: str = "data/test"
    clean_data_dir: str = "data/clean"
    logos_dir: str = "data/logos"
    generate_video: bool = True
    inpaint_model: str = "lama"
    # Optional frozen held-out triad dir (watermarked/ clean/ masks/, the
    # docs/QUALITY.md protocol layout). When set, each cycle ends with a
    # held-out raw-IoU evaluation of its newest checkpoint, making
    # cycle-over-cycle quality movement legible in cycle_info.json —
    # the reference only eyeballs videos (auto_train.py:258-304).
    heldout_eval_dir: str = ""
    heldout_eval_limit: int = 32
    # round 5: second (textured-tier) held-out dir — when set, step 6
    # reports both tiers per cycle so the loop's movement on the hard
    # (natural-statistics) distribution is visible, not just smooth IoU
    heldout_eval_tex_dir: str = ""


class AutoTrainingLoop:
    """auto_train.py:43-673 analog."""

    def __init__(self, config: AutoTrainConfig, base_cfg=None):
        from ..configs import get_cfg_defaults, update_config

        self.config = config
        self.cfg = base_cfg.clone() if base_cfg is not None else \
            get_cfg_defaults()
        if base_cfg is None and config.config_path and \
                os.path.exists(config.config_path):
            update_config(self.cfg, config.config_path)
        self.cfg.TRAIN.BATCH_SIZE = config.batch_size
        self.cfg.TRAIN.LR = config.learning_rate
        root = config.project_root
        self.train_dir = os.path.join(root, config.train_data_dir)
        self.test_dir = os.path.join(root, config.test_data_dir)
        self.clean_dir = os.path.join(root, config.clean_data_dir)
        self.logos_dir = os.path.join(root, config.logos_dir)
        self.output_dir = os.path.join(root, config.output_dir)
        os.makedirs(self.output_dir, exist_ok=True)
        self.cfg.DATA.ROOT_DIR = self.train_dir
        self.cfg.TRAIN.CHECKPOINT_DIR = os.path.join(self.output_dir,
                                                     "checkpoints")
        self.cycle_history: List[Dict] = []

    # ------------------------------------------------------------------
    def step1_model_selection(self, cycle: int) -> Optional[str]:
        """auto_train.py:117-141."""
        from ..scripts.model_selector import ModelSelector

        ckpt_dir = self.cfg.TRAIN.CHECKPOINT_DIR
        if not os.path.isdir(ckpt_dir) or not os.listdir(ckpt_dir):
            logger.info("cycle %d: no checkpoints yet, training from "
                        "scratch", cycle)
            return None
        if not os.path.isdir(self.test_dir) or not os.listdir(self.test_dir):
            # fall back to newest checkpoint when no eval images exist
            from .checkpoint import latest_checkpoint
            return latest_checkpoint(ckpt_dir)
        selector = ModelSelector(
            models_dir=ckpt_dir, images_dir=self.test_dir,
            output_dir=os.path.join(self.output_dir,
                                    f"cycle_{cycle}_selection"),
            config=self.cfg, num_images=min(10, self.config.prediction_limit))
        try:
            return selector.get_best_model_path()
        except Exception as e:  # noqa: BLE001
            logger.error("model selection failed: %s", e)
            return None

    def step2_training(self, cycle: int, resume_from: Optional[str]) -> Dict:
        """auto_train.py:143-199: +K epochs ON TOP of the resumed
        checkpoint's epoch (reference sets EPOCHS = current + K,
        auto_train.py:167-179)."""
        from .train import train

        cfg = self.cfg.clone()
        base_epoch = 0
        if resume_from:
            meta_path = os.path.join(resume_from, "meta.json")
            if os.path.exists(meta_path):
                with open(meta_path) as f:
                    base_epoch = int(json.load(f).get("epoch", 0))
        cfg.TRAIN.EPOCHS = base_epoch + self.config.epochs_per_cycle
        cfg.TRAIN.OUTPUT_DIR = os.path.join(self.output_dir,
                                            f"cycle_{cycle}_training")
        cfg.TRAIN.MODEL_SAVE_PATH = os.path.join(
            self.output_dir, f"cycle_{cycle}_model.pth")
        return train(cfg, resume_from=resume_from)

    def step3_prediction(self, cycle: int) -> Dict:
        """auto_train.py:201-256: repair over test folder, no OCR (:233)."""
        from ..inference import WatermarkPredictor
        from .checkpoint import latest_checkpoint

        best = latest_checkpoint(self.cfg.TRAIN.CHECKPOINT_DIR) or \
            os.path.join(self.cfg.TRAIN.CHECKPOINT_DIR, "best_model")
        out = os.path.join(self.output_dir, f"cycle_{cycle}_predictions")
        predictor = WatermarkPredictor(model_path=best, config=self.cfg)
        return predictor.process_folder_batch(
            self.test_dir, out, watermark_model=self.config.inpaint_model,
            use_ocr=False, limit=self.config.prediction_limit, steps=1)

    def step4_video_generation(self, cycle: int) -> Optional[str]:
        """auto_train.py:258-304."""
        if not self.config.generate_video:
            return None
        from ..scripts.video_generator import VideoGenerator

        pred_dir = os.path.join(self.output_dir,
                                f"cycle_{cycle}_predictions")
        video = os.path.join(self.output_dir, f"cycle_{cycle}_video.mp4")
        gen = VideoGenerator(width=1280, height=720, duration_per_image=1.0,
                             fps=15)
        return gen.create_side_by_side_video(self.test_dir, pred_dir, video)

    def step5_data_augmentation(self, cycle: int) -> Dict:
        """auto_train.py:306-490: grow dataset by data_growth with the
        configured type ratios."""
        from ..data.gen_data import generate_dataset

        wm_dir = os.path.join(self.train_dir, "watermarked")
        existing = len(os.listdir(wm_dir)) if os.path.isdir(wm_dir) else 0
        new_count = max(int(existing * self.config.data_growth), 10)
        ratios = {
            "logo": max(self.config.transparent_ratio -
                        self.config.text_watermark_ratio / 2, 0.1),
            "multi": self.config.multi_watermark_ratio,
            "text": self.config.text_watermark_ratio,
            "mixed": self.config.mixed_watermark_ratio,
        }
        if not os.path.isdir(self.clean_dir) or not os.listdir(
                self.clean_dir):
            logger.warning("no clean images at %s; skipping augmentation",
                           self.clean_dir)
            return {"generated": 0}
        stats = generate_dataset(
            self.clean_dir, self.train_dir,
            logos_dir=self.logos_dir if os.path.isdir(self.logos_dir)
            else None,
            count=new_count, ratios=ratios, seed=1000 + cycle)
        return {"generated": sum(v for k, v in stats.items()
                                 if k != "skipped"), **stats}

    def step6_heldout_eval(self, cycle: int) -> Optional[Dict]:
        """Score the cycle's newest checkpoint on the frozen held-out
        protocol (scripts/quality_report.eval_segmentation) so the loop
        reports objective cycle-over-cycle movement, not just val loss."""
        root = self.config.heldout_eval_dir
        if not root:
            return None
        from ..scripts.quality_report import eval_segmentation
        from .checkpoint import latest_checkpoint

        ckpt = latest_checkpoint(self.cfg.TRAIN.CHECKPOINT_DIR)
        if not ckpt:
            # short cycles may not cross SAVE_INTERVAL; the best-model
            # checkpoint is written every improvement (train.py:369)
            best = os.path.join(self.cfg.TRAIN.CHECKPOINT_DIR, "best_model")
            ckpt = best if os.path.isdir(os.path.join(best, "tree")) else None
        if not ckpt:
            return None
        out: Dict = {"checkpoint": ckpt}
        tiers = [("smooth", root)]
        if self.config.heldout_eval_tex_dir:
            tiers.append(("textured", self.config.heldout_eval_tex_dir))
        for tier, tier_root in tiers:
            res = eval_segmentation(
                tier_root, limit=self.config.heldout_eval_limit,
                weights=ckpt, model_name=self.cfg.MODEL.NAME,
                encoder=self.cfg.MODEL.ENCODER_NAME,
                img_size=self.cfg.DATA.IMG_SIZE)
            out[tier] = {"n_images": res.get("n_images"),
                         "raw": res.get("raw"),
                         "pipeline": res.get("pipeline"),
                         "error": res.get("error")}
        # backwards-compatible flat keys (round-3/4 consumers)
        out.update(out["smooth"])
        return out

    # ------------------------------------------------------------------
    def run_cycle(self, cycle: int) -> Dict:
        """auto_train.py:492-553."""
        info: Dict = {"cycle": cycle, "start_time": time.time(),
                      "steps": {}}
        try:
            best = self.step1_model_selection(cycle)
            info["steps"]["model_selection"] = {"best_model": best}

            tr = self.step2_training(cycle, best)
            info["steps"]["training"] = {
                "best_val_loss": tr["best_val_loss"],
                "epochs_run": tr["epochs_run"],
            }

            pred = self.step3_prediction(cycle)
            info["steps"]["prediction"] = {
                "status": pred.get("status"),
                "successful_images": pred.get("successful_images", 0),
            }

            video = self.step4_video_generation(cycle)
            info["steps"]["video"] = {"path": video}

            aug = self.step5_data_augmentation(cycle)
            info["steps"]["data_augmentation"] = aug

            held = self.step6_heldout_eval(cycle)
            if held is not None:
                info["steps"]["heldout_eval"] = held
            info["status"] = "success"
        except Exception as e:  # noqa: BLE001
            logger.exception("cycle %d failed: %s", cycle, e)
            info["status"] = "failed"
            info["error"] = str(e)
        info["duration"] = time.time() - info["start_time"]
        with open(os.path.join(self.output_dir,
                               f"cycle_{cycle}_info.json"), "w") as f:
            json.dump(info, f, indent=2, default=str)
        return info

    def run_all_cycles(self) -> Dict:
        """auto_train.py:555-620."""
        for cycle in range(self.config.max_cycles):
            logger.info("=== auto-train cycle %d/%d ===", cycle + 1,
                        self.config.max_cycles)
            info = self.run_cycle(cycle)
            self.cycle_history.append(info)
        report = {
            "cycles_completed": len(self.cycle_history),
            "successful_cycles": sum(
                1 for c in self.cycle_history if c["status"] == "success"),
            "cycles": self.cycle_history,
        }
        with open(os.path.join(self.output_dir, "final_report.json"),
                  "w") as f:
            json.dump(report, f, indent=2, default=str)
        return report
