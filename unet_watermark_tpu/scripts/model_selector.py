"""Model selection — analog of /root/reference/src/scripts/model_selector.py.

The reference fans a multiprocessing.Pool (spawn, <=4 procs) across
checkpoints, each process re-creating a full WatermarkPredictor
(model_selector.py:26-31,338-343). The TPU rebuild evaluates MANY
checkpoints in ONE graph: parameter pytrees of same-architecture
checkpoints are stacked on a leading axis and the forward is vmapped over
it — all models score every image in a single device program (SURVEY.md
§2.2 "vmapped multi-checkpoint evaluation"). Heterogeneous checkpoints
fall back to sequential evaluation (the reference's serial fallback,
:415).

Per-image metrics keep the reference semantics (calculate_watermark_metrics,
:171-199): watermark_ratio, component count, largest-component ratio;
per-model statistics include detection_rate (ratio > 0.001) and the best
model is the one with the highest detection_rate. Results land in
model_evaluation_results.json (:404-406).
"""
from __future__ import annotations

import json
import logging
import os
import random
import time
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)

DETECTION_THRESHOLD = 0.001  # watermark_ratio above this counts as detected


def calculate_watermark_metrics(mask: np.ndarray,
                                image_shape: Tuple[int, int]) -> Dict:
    """Reference-parity per-mask metrics (model_selector.py:171-199)."""
    total = image_shape[0] * image_shape[1]
    px = int((mask > 0).sum())
    n, labels, stats, _ = cv2.connectedComponentsWithStats(
        (mask > 0).astype(np.uint8))
    ncomp = n - 1
    if ncomp > 0:
        areas = stats[1:, cv2.CC_STAT_AREA]
        max_area = int(areas.max())
    else:
        max_area = 0
    return {
        "watermark_ratio": px / total,
        "watermark_pixels": px,
        "total_pixels": total,
        "num_components": ncomp,
        "max_component_area": max_area,
        "max_component_ratio": max_area / total,
    }


class ModelSelector:
    """model_selector.py:199-632 analog."""

    def __init__(self, models_dir: str, images_dir: str,
                 output_dir: str = "model_evaluation",
                 config_path: Optional[str] = None,
                 config=None, num_images: int = 10, seed: int = 42):
        from ..configs import get_cfg_defaults, update_config

        self.models_dir = models_dir
        self.images_dir = images_dir
        self.output_dir = output_dir
        self.num_images = num_images
        self.seed = seed
        self.cfg = config if config is not None else get_cfg_defaults()
        if config is None and config_path and os.path.exists(config_path):
            update_config(self.cfg, config_path)

    # ------------------------------------------------------------------
    def discover_checkpoints(self) -> List[str]:
        """All .pth files + orbax checkpoint dirs under models_dir."""
        found = []
        if not os.path.isdir(self.models_dir):
            return found
        for name in sorted(os.listdir(self.models_dir)):
            p = os.path.join(self.models_dir, name)
            if name.endswith(".pth"):
                found.append(p)
            elif os.path.isdir(p) and os.path.exists(
                    os.path.join(p, "meta.json")):
                found.append(p)
        return found

    def sample_images(self) -> List[str]:
        exts = (".jpg", ".jpeg", ".png", ".bmp", ".webp")
        files = sorted(
            os.path.join(self.images_dir, f)
            for f in os.listdir(self.images_dir)
            if f.lower().endswith(exts))
        if len(files) > self.num_images:
            random.Random(self.seed).shuffle(files)
            files = files[: self.num_images]
        return files

    # ------------------------------------------------------------------
    def _load_params(self, path: str):
        from ..models import create_model_from_config, init_model

        model = create_model_from_config(self.cfg)
        variables = init_model(model, self.cfg.DATA.IMG_SIZE, seed=0)
        if path.endswith(".pth"):
            from ..models.torch_import import import_pth
            variables, _ = import_pth(path, variables)
        else:
            from ..training.checkpoint import restore_raw
            tree, _ = restore_raw(path)
            variables = {"params": tree["params"],
                         "batch_stats": tree.get("batch_stats", {})}
        return model, variables

    def _stackable(self, trees) -> bool:
        if not trees:
            return False
        ref = jax.tree_util.tree_structure(trees[0])
        shapes = [tuple(np.shape(l))
                  for l in jax.tree_util.tree_leaves(trees[0])]
        for t in trees[1:]:
            if jax.tree_util.tree_structure(t) != ref:
                return False
            if [tuple(np.shape(l))
                    for l in jax.tree_util.tree_leaves(t)] != shapes:
                return False
        return True

    # ------------------------------------------------------------------
    def run_evaluation(self) -> Dict:
        """model_selector.py:305-413 analog; returns the full results dict
        and writes model_evaluation_results.json."""
        os.makedirs(self.output_dir, exist_ok=True)
        checkpoints = self.discover_checkpoints()
        images = self.sample_images()
        if not checkpoints:
            return {"status": "error", "message": "no checkpoints found"}
        if not images:
            return {"status": "error", "message": "no images found"}
        logger.info("evaluating %d checkpoints on %d images",
                    len(checkpoints), len(images))
        t0 = time.time()

        s = self.cfg.DATA.IMG_SIZE
        batch = np.stack([
            cv2.resize(cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB),
                       (s, s)).astype(np.float32) / 255.0
            for p in images])
        sizes = [cv2.imread(p).shape[:2] for p in images]

        loaded = []
        for ck in checkpoints:
            try:
                model, variables = self._load_params(ck)
                loaded.append((ck, model, variables))
            except Exception as e:  # noqa: BLE001
                logger.error("failed to load %s: %s", ck, e)
        if not loaded:
            return {"status": "error", "message": "no loadable checkpoints"}

        trees = [v for (_, _, v) in loaded]
        model = loaded[0][1]
        from ..ops.augment import IMAGENET_MEAN, IMAGENET_STD
        norm = (jnp.asarray(batch) - IMAGENET_MEAN) / IMAGENET_STD

        if self._stackable(trees):
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *trees)

            @jax.jit
            def multi_forward(vs, imgs):
                return jax.vmap(
                    lambda v: jax.nn.sigmoid(
                        model.apply(v, imgs, train=False)))(vs)

            probs_all = np.asarray(multi_forward(stacked, norm))  # (M,N,S,S,1)
        else:
            logger.info("checkpoints not homogeneous; sequential eval")
            probs_all = np.stack([
                np.asarray(jax.nn.sigmoid(m.apply(v, norm, train=False)))
                for (_, m, v) in loaded])

        threshold = self.cfg.PREDICT.THRESHOLD
        all_results: Dict = {"models": {}}
        for mi, (ck, _, _) in enumerate(loaded):
            name = os.path.basename(ck)
            predictions = []
            detected = 0
            ratios = []
            for ni, img_path in enumerate(images):
                oh, ow = sizes[ni]
                prob = cv2.resize(probs_all[mi, ni, :, :, 0], (ow, oh))
                mask = ((prob > threshold) * 255).astype(np.uint8)
                metrics = calculate_watermark_metrics(mask, (oh, ow))
                ratios.append(metrics["watermark_ratio"])
                if metrics["watermark_ratio"] > DETECTION_THRESHOLD:
                    detected += 1
                mask_file = os.path.join(
                    self.output_dir,
                    f"{os.path.splitext(os.path.basename(img_path))[0]}_"
                    f"{name.replace('.pth', '')}_mask.png")
                cv2.imwrite(mask_file, mask)
                predictions.append({
                    "image_name": os.path.basename(img_path),
                    "image_path": img_path,
                    "mask_path": mask_file,
                    "metrics": metrics,
                    "success": True,
                    "error": None,
                })
            stats = {
                "detection_rate": detected / len(images),
                "avg_watermark_ratio": float(np.mean(ratios)),
                "max_watermark_ratio": float(np.max(ratios)),
                "evaluated_images": len(images),
            }
            all_results["models"][name] = {
                "model_path": ck,
                "predictions": predictions,
                "statistics": stats,
            }

        successful = list(all_results["models"])
        best = max(successful, key=lambda n: all_results["models"][n]
                   ["statistics"]["detection_rate"])
        summary = {
            "total_models": len(checkpoints),
            "successful_models": len(successful),
            "evaluation_time": time.time() - t0,
            "best_detection_model": {
                "name": best,
                "path": all_results["models"][best]["model_path"],
                "detection_rate": all_results["models"][best]
                ["statistics"]["detection_rate"],
            },
        }
        all_results["summary"] = summary
        out_json = os.path.join(self.output_dir,
                                "model_evaluation_results.json")
        with open(out_json, "w") as f:
            json.dump(all_results, f, indent=2)
        logger.info("best model: %s (detection_rate=%.2f%%)", best,
                    summary["best_detection_model"]["detection_rate"] * 100)
        return all_results

    def get_best_model_path(self) -> Optional[str]:
        results = self.run_evaluation()
        best = results.get("summary", {}).get("best_detection_model")
        return best["path"] if best else None
