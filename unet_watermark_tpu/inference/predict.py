"""WatermarkPredictor — the batched detect→repair pipeline.

TPU rebuild of /root/reference/src/predict.py (the core product). The
reference runs a 5-step, per-image, host-bound loop: UNet forward at batch
size 1, cv2 post-processing, iopaint subprocess repair with temp-dir file
shuffling (predict.py:560-1331). Here the same steps exist — same folder
layout, same artifacts, same skip/fallback rules — but each step is a
batched device computation:

  step1  decode N images → ONE forward per batch → type detection and
         type-aware mask optimization vmapped on device → masks to disk
  step2  watermark repair: in-process batched inpaint engine (no
         subprocess, no temp dirs), `steps` iterations on device
  step3  OCR (host engines by nature) → box rasterization + dilation on
         device
  step4  text repair: same engine with text masks
  step5  mask merge (max) + optimization, on device

A fused single-graph path (`repair_batch_fused`) runs detect→threshold→
optimize→inpaint without leaving the chip — the BASELINE.json north-star
configuration.

Deviation notes vs the reference (by design):
  * mask optimization happens at model resolution in the batched steps
    (one compiled shape), then final masks are resized to the original;
    `predict_mask()` keeps original-resolution semantics for API parity.
  * Canny inside type detection is a Sobel-magnitude threshold (see
    inference/maskproc.py).
"""
from __future__ import annotations

import functools
import glob
import logging
import os
import random
import shutil
import time
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import Config, get_cfg_defaults, update_config
from ..models import create_model_from_config, init_model
from ..ops.augment import IMAGENET_MEAN, IMAGENET_STD
from . import maskproc
from .engines import get_engine
from .tiled import pad_to_multiple, predict_tiled

logger = logging.getLogger(__name__)

IMAGE_EXTS = ("jpg", "jpeg", "png", "bmp", "tiff", "webp")


def default_seg_weights(cfg) -> Optional[str]:
    """Shipped trained segmentation weights for the configured arch, or
    None. The reference assumes a user-supplied models/*.pth; a fresh
    clone of this repo carries bf16 .npz weights for the flagship under
    unet_watermark_tpu/weights/ (utils/shipping.py format). Override
    with the PREDICT_SEG_WEIGHTS env var."""
    from ..utils.shipping import resolve

    path = resolve("seg", cfg=cfg)
    return path if path and os.path.exists(path) else None


@functools.lru_cache(maxsize=8)
def _connectivity_batch_fn(min_area: int, connectivity: int):
    """Jitted vmapped small-component filter (one compile per shape)."""
    from ..ops import components as cc

    return jax.jit(jax.vmap(lambda mk: cc.filter_components_by_area(
        mk, min_area=min_area, connectivity=connectivity)))


class WatermarkPredictor:
    """Analog of predict.py:38-1331 WatermarkPredictor."""

    def __init__(self, model_path: Optional[str] = None,
                 config_path: Optional[str] = None,
                 config: Optional[Config] = None,
                 device: str = "tpu",  # accepted for API parity; jax places
                 state=None,
                 inpaint_engine: Optional[str] = None):
        self.cfg = config if config is not None else get_cfg_defaults()
        if config is None and config_path and os.path.exists(config_path):
            update_config(self.cfg, config_path)
        self.device = device
        self.model = create_model_from_config(self.cfg)
        self.model_info: Dict = {}
        self._weights_path: Optional[str] = None
        self.variables = self._load_weights(model_path, state)
        self.img_size = self.cfg.DATA.IMG_SIZE
        self._engine_name = inpaint_engine
        self._quant_scales = self._load_quant_scales()
        self._forward = jax.jit(self._apply_model)
        self._print_model_info()

    def _apply_model(self, imgs):
        """The segmentation forward — bf16, or int8-PTQ when the config
        enables PREDICT.QUANT and a calibrated sidecar resolved. Every
        consumer (batched step-1, fused repair graph) goes through this
        so the quant tier applies uniformly."""
        if self._quant_scales:
            from ..ops.quant import quant_int8
            with quant_int8(self._quant_scales):
                return self.model.apply(self.variables, imgs, train=False)
        return self.model.apply(self.variables, imgs, train=False)

    def _load_quant_scales(self) -> Optional[dict]:
        if not getattr(self.cfg.PREDICT, "QUANT", False):
            return None
        from ..ops.quant import load_scales
        from ..scripts.calibrate_quant import quant_sidecar_path

        if not self._weights_path:
            logger.warning("PREDICT.QUANT set but weights are random init — "
                           "staying bf16")
            return None
        sidecar = quant_sidecar_path(self._weights_path)
        if not os.path.exists(sidecar):
            logger.warning(
                "PREDICT.QUANT set but no calibration sidecar at %s — "
                "staying bf16 (run scripts/calibrate_quant.py)", sidecar)
            return None
        scales = load_scales(sidecar)
        logger.info("int8 inference tier: %d calibrated conv scales (%s)",
                    len(scales), sidecar)
        return scales

    # ------------------------------------------------------------------
    # weights (predict.py:68-112)
    # ------------------------------------------------------------------
    def _load_weights(self, model_path, state):
        variables = init_model(self.model, self.cfg.DATA.IMG_SIZE, seed=0)
        if state is not None:
            return {"params": state.params, "batch_stats": state.batch_stats}
        if model_path is None:
            model_path = default_seg_weights(self.cfg)
            if model_path is None:
                logger.warning("no model weights given — using random init")
                return variables
            logger.info("using shipped default weights: %s", model_path)
        self._weights_path = model_path
        if model_path.endswith(".npz"):
            from ..utils.shipping import load_params_npz
            variables = load_params_npz(model_path, variables)
            self.model_info = {"epoch": "shipped", "val_loss": "see npz"}
            return variables
        if not os.path.exists(model_path):
            raise FileNotFoundError(f"model not found: {model_path}")
        if model_path.endswith(".pth"):
            from ..models.torch_import import (
                detect_decoder_impl,
                import_pth,
                load_pth,
            )
            if self.cfg.MODEL.NAME.lower() in ("unetplusplus", "unet++"):
                impl = detect_decoder_impl(load_pth(model_path))
                if impl != getattr(self.cfg.MODEL, "DECODER_IMPL",
                                   "canonical"):
                    # reference (smp-trained) checkpoint: rebuild the model
                    # with the matching decoder structure before importing
                    logger.info("checkpoint uses the '%s' UNet++ decoder "
                                "layout — rebuilding model to match", impl)
                    self.cfg.MODEL.DECODER_IMPL = impl
                    self.model = create_model_from_config(self.cfg)
                    variables = init_model(self.model,
                                           self.cfg.DATA.IMG_SIZE, seed=0)
            variables, report = import_pth(model_path, variables)
            try:
                import torch
                obj = torch.load(model_path, map_location="cpu",
                                 weights_only=False)
                if isinstance(obj, dict):
                    self.model_info = {
                        "epoch": obj.get("epoch", "Unknown"),
                        "val_loss": obj.get("val_loss",
                                            obj.get("best_val_loss",
                                                    "Unknown")),
                    }
            except Exception:  # noqa: BLE001
                pass
            logger.info("loaded .pth: %d tensors, %d unmatched",
                        len(report["loaded"]), len(report["missing"]))
            return variables
        # orbax checkpoint dir (ours) — raw restore: inference never needs
        # the optimizer state, and a template restore would break whenever
        # the checkpoint's optimizer differs from the current config
        from ..training.checkpoint import restore_raw
        tree, meta = restore_raw(model_path)
        self.model_info = {"epoch": meta.get("epoch", "Unknown"),
                           "val_loss": meta.get("best_val_loss", "Unknown")}
        return {"params": tree["params"],
                "batch_stats": tree.get("batch_stats", {})}

    def _print_model_info(self):
        logger.info("UNet model: %s/%s, epoch=%s val_loss=%s",
                    self.cfg.MODEL.NAME, self.cfg.MODEL.ENCODER_NAME,
                    self.model_info.get("epoch", "?"),
                    self.model_info.get("val_loss", "?"))

    # ------------------------------------------------------------------
    # file discovery (predict.py:114-160)
    # ------------------------------------------------------------------
    def _get_image_files(self, input_folder: str,
                         output_folder: Optional[str] = None,
                         limit: Optional[int] = None) -> List[str]:
        files: List[str] = []
        for ext in IMAGE_EXTS:
            files.extend(glob.glob(os.path.join(input_folder, f"*.{ext}")))
            files.extend(glob.glob(os.path.join(input_folder,
                                                f"*.{ext.upper()}")))
        files = sorted(set(files))
        if output_folder and os.path.isdir(output_folder):
            remaining = []
            for p in files:
                stem = os.path.splitext(os.path.basename(p))[0]
                if not os.path.exists(os.path.join(output_folder,
                                                   f"{stem}_mask.png")):
                    remaining.append(p)
            files = remaining
        if limit is not None and 0 < limit < len(files):
            random.shuffle(files)
            files = files[:limit]
        return files

    # ------------------------------------------------------------------
    # core forward helpers
    # ------------------------------------------------------------------
    def _normalize(self, images_01: np.ndarray) -> jnp.ndarray:
        return (jnp.asarray(images_01) - IMAGENET_MEAN) / IMAGENET_STD

    def _forward_probs(self, images_01: np.ndarray) -> np.ndarray:
        """(N,S,S,3) [0,1] → (N,S,S) sigmoid probabilities."""
        logits = self._forward(self._normalize(images_01))
        return np.asarray(jax.nn.sigmoid(logits))[..., 0]

    def _enhance_text_features(self, image_rgb: np.ndarray) -> np.ndarray:
        """CLAHE + Canny-edge boost + sharpen (predict.py:370-412) — host
        preprocessing of the input image before the forward."""
        gray = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2GRAY)
        clahe = cv2.createCLAHE(clipLimit=2.0, tileGridSize=(8, 8))
        enhanced = clahe.apply(gray)
        edges = cv2.Canny(enhanced, 50, 150)
        kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (2, 2))
        edges = cv2.dilate(edges, kernel, iterations=1)
        out = image_rgb.astype(np.float32)
        boost = (edges > 0)[..., None]
        out = np.where(boost, np.clip(out * 1.2, 0, 255), out)
        sharpen = np.array([[-1, -1, -1], [-1, 9, -1], [-1, -1, -1]],
                           np.float32)
        out = cv2.filter2D(out.astype(np.uint8), -1, sharpen)
        return out

    # ------------------------------------------------------------------
    # single-image API (predict.py:303-368) — original-resolution parity
    # ------------------------------------------------------------------
    def predict_mask(self, image_path: str,
                     mask_type: str = "watermark") -> np.ndarray:
        image = cv2.imread(image_path)
        if image is None:
            raise ValueError(f"cannot read image: {image_path}")
        orig_h, orig_w = image.shape[:2]
        image_rgb = cv2.cvtColor(image, cv2.COLOR_BGR2RGB)
        if mask_type in ("text", "mixed"):
            image_rgb = self._enhance_text_features(image_rgb)

        probs = self._infer_prob_map(image_rgb)
        mask_bin = (cv2.resize(probs, (orig_w, orig_h)) >
                    self.cfg.PREDICT.THRESHOLD).astype(np.float32)
        if not self.cfg.PREDICT.POST_PROCESS:
            return (mask_bin * 255).astype(np.uint8)
        # optimize on device at the original (padded) resolution
        padded, (h, w) = pad_to_multiple(mask_bin, 32)
        opt = maskproc.optimize_mask(
            jnp.asarray(padded), mask_type,
            mode=maskproc.resolve_mask_mode(self.cfg.PREDICT.MASK_MODE,
                                            "artifact"))
        if self.cfg.PREDICT.EDGE_REFINEMENT:
            # soften + re-threshold against the prob map so edges follow
            # the network's confidence rather than morphology artifacts
            # (unet_text_watermark.yaml:88 EDGE_REFINEMENT)
            from ..ops import morphology as m
            soft = m.gaussian_blur(opt, (5, 5), 1.5)
            probs_pad, _ = pad_to_multiple(
                cv2.resize(probs, (orig_w, orig_h)), 32)
            opt = m.threshold_binary(
                soft * (0.5 + jnp.asarray(probs_pad)), 0.5)
        if self.cfg.PREDICT.CONNECTIVITY_CHECK:
            from ..ops import components as cc
            opt = cc.filter_components_by_area(
                opt, min_area=self.cfg.TEXT_WATERMARK.MIN_COMPONENT_AREA,
                connectivity=self.cfg.TEXT_WATERMARK.CONNECTIVITY)
        return (np.asarray(opt)[:h, :w] * 255).astype(np.uint8)

    def predict_text_watermark_mask(self, image_path: str) -> np.ndarray:
        return self.predict_mask(image_path, mask_type="text")

    def predict_mixed_watermark_mask(self, image_path: str) -> np.ndarray:
        return self.predict_mask(image_path, mask_type="mixed")

    def _infer_prob_map(self, image_rgb: np.ndarray) -> np.ndarray:
        """Model-resolution (or tiled) probability map for one image.

        With PREDICT.MULTI_SCALE_TEST, runs the forward at each
        PREDICT.TEST_SCALES factor of the model resolution and averages
        the maps (unet_text_watermark.yaml:85-87) — one extra compile per
        distinct scale, all batched shapes stay static.
        """
        h, w = image_rgb.shape[:2]
        s = self.img_size
        if self.cfg.PREDICT.TILED and min(h, w) >= self.cfg.PREDICT.TILE_SIZE \
                and max(h, w) > s:
            padded, (oh, ow) = pad_to_multiple(
                image_rgb.astype(np.float32) / 255.0, 32,
                min_size=self.cfg.PREDICT.TILE_SIZE)
            norm = self._normalize(padded[None])[0]
            logits = predict_tiled(
                self._forward, norm, tile=self.cfg.PREDICT.TILE_SIZE,
                overlap=self.cfg.PREDICT.TILE_OVERLAP,
                batch=self.cfg.PREDICT.BATCH_SIZE)
            return np.asarray(jax.nn.sigmoid(logits))[:oh, :ow, 0]
        scales = (list(self.cfg.PREDICT.TEST_SCALES)
                  if self.cfg.PREDICT.MULTI_SCALE_TEST else [1.0])
        acc = np.zeros((s, s), np.float32)
        for scale in scales:
            side = max(int(round(s * scale / 32)) * 32, 32)
            resized = cv2.resize(image_rgb, (side, side)).astype(
                np.float32) / 255.0
            probs = self._forward_probs(resized[None])[0]
            if side != s:
                probs = cv2.resize(probs, (s, s))
            acc += probs
        return acc / len(scales)

    # ------------------------------------------------------------------
    # type detection (predict.py:414-443)
    # ------------------------------------------------------------------
    def _detect_watermark_type(self, image_rgb: np.ndarray,
                               mask_binary: np.ndarray) -> str:
        try:
            score = float(maskproc.detect_watermark_type_scores(
                jnp.asarray(image_rgb, jnp.float32),
                jnp.asarray((mask_binary > 127).astype(np.float32))))
            return maskproc.classify_type(score)
        except Exception as e:  # noqa: BLE001
            logger.warning("type detection failed (%s); using 'watermark'", e)
            return "watermark"

    # ------------------------------------------------------------------
    # STEP 1 (predict.py:560-666) — batched
    # ------------------------------------------------------------------
    def step1_batch_predict_watermark_masks(
            self, input_folder: str, mask_output_folder: str,
            limit: Optional[int] = None) -> List[dict]:
        os.makedirs(mask_output_folder, exist_ok=True)
        image_files = self._get_image_files(input_folder, mask_output_folder,
                                            limit=limit)
        if not image_files:
            logger.warning("no unprocessed images in %s", input_folder)
            return []
        logger.info("step1: %d images", len(image_files))

        s = self.img_size
        bs = self.cfg.PREDICT.BATCH_SIZE
        processed: List[dict] = []

        from tqdm import tqdm
        for i in tqdm(range(0, len(image_files), bs), desc="step1 predict",
                      unit="batch"):
            chunk = image_files[i:i + bs]
            imgs_rgb, sizes, ok_paths = [], [], []
            for p in chunk:
                img = cv2.imread(p)
                if img is None:
                    logger.error("cannot load %s", p)
                    continue
                rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                h, w = rgb.shape[:2]
                if self.cfg.PREDICT.TILED and \
                        min(h, w) >= self.cfg.PREDICT.TILE_SIZE and \
                        max(h, w) > s:
                    # high-res images take the tiled sliding-window path at
                    # native resolution (predict.py:303-368 semantics; the
                    # reference only ever downscales — SURVEY.md §5 gap)
                    rec = self._step1_tiled_single(p, rgb,
                                                   mask_output_folder)
                    if rec is not None:
                        processed.append(rec)
                    continue
                sizes.append((h, w))
                imgs_rgb.append(rgb)
                ok_paths.append(p)
            if not ok_paths:
                continue
            probs = self._batch_prob_maps(imgs_rgb, bs)

            # type detection + optimization on device at model resolution
            masks_bin = (probs > self.cfg.PREDICT.THRESHOLD).astype(
                np.float32)
            small_rgbs = np.stack([cv2.resize(r, (s, s)) for r in imgs_rgb])
            types = []
            for j in range(len(ok_paths)):
                score = float(maskproc.detect_watermark_type_scores(
                    jnp.asarray(small_rgbs[j], jnp.float32),
                    jnp.asarray(masks_bin[j])))
                types.append(maskproc.classify_type(score))
            codes = [maskproc.type_code(t) for t in types]
            opt = maskproc.optimize_mask_batch_partitioned(
                masks_bin, codes,
                mode=maskproc.resolve_mask_mode(
                    self.cfg.PREDICT.MASK_MODE, "artifact"))
            opt = self._apply_predict_flags_batch(opt, probs)

            for j, p in enumerate(ok_paths):
                oh, ow = sizes[j]
                mask_full = cv2.resize(
                    (np.asarray(opt[j]) * 255).astype(np.uint8), (ow, oh),
                    interpolation=cv2.INTER_NEAREST)
                stem = os.path.splitext(os.path.basename(p))[0]
                mask_path = os.path.join(mask_output_folder,
                                         f"{stem}_mask.png")
                cv2.imwrite(mask_path, mask_full)
                wm_px = int((mask_full > 0).sum())
                if wm_px == 0:
                    logger.info("no watermark detected, skipping: %s", stem)
                    continue
                processed.append({
                    "image_path": p,
                    "original_path": p,
                    "mask_path": mask_path,
                    "mask_type": types[j],
                    "watermark_ratio": wm_px / (oh * ow),
                })
        logger.info("step1 done: %d with watermark / %d total",
                    len(processed), len(image_files))
        return processed

    def _batch_prob_maps(self, imgs_rgb: List[np.ndarray],
                         bs: int) -> np.ndarray:
        """(len(imgs), S, S) probability maps for a chunk, honoring
        PREDICT.MULTI_SCALE_TEST (unet_text_watermark.yaml:85-87) in the
        batched path: one padded static-shape forward per test scale,
        averaged at model resolution."""
        s = self.img_size
        scales = (list(self.cfg.PREDICT.TEST_SCALES)
                  if self.cfg.PREDICT.MULTI_SCALE_TEST else [1.0])
        n = len(imgs_rgb)
        acc = np.zeros((n, s, s), np.float32)
        for scale in scales:
            side = max(int(round(s * scale / 32)) * 32, 32)
            batch = np.stack([
                cv2.resize(r, (side, side)).astype(np.float32) / 255.0
                for r in imgs_rgb])
            if batch.shape[0] < bs:  # static shape
                batch = np.concatenate(
                    [batch, np.zeros((bs - batch.shape[0], side, side, 3),
                                     np.float32)])
            probs = self._forward_probs(batch)[:n]
            if side != s:
                probs = np.stack([cv2.resize(pm, (s, s)) for pm in probs])
            acc += probs
        return acc / len(scales)

    def _apply_predict_flags_batch(self, opt: np.ndarray,
                                   probs: np.ndarray) -> np.ndarray:
        """EDGE_REFINEMENT + CONNECTIVITY_CHECK on a batch of optimized
        masks (same ops as the single-image path in predict_mask,
        unet_text_watermark.yaml:88-94)."""
        if self.cfg.PREDICT.EDGE_REFINEMENT:
            from ..ops import morphology as m
            soft = m.gaussian_blur(jnp.asarray(opt), (5, 5), 1.5)
            opt = np.asarray(m.threshold_binary(
                soft * (0.5 + jnp.asarray(probs)), 0.5))
        if self.cfg.PREDICT.CONNECTIVITY_CHECK:
            from ..ops import components as cc
            min_area = self.cfg.TEXT_WATERMARK.MIN_COMPONENT_AREA
            conn = self.cfg.TEXT_WATERMARK.CONNECTIVITY
            fn = _connectivity_batch_fn(min_area, conn)
            opt = np.asarray(fn(jnp.asarray(opt)))
        return opt

    def _step1_tiled_single(self, path: str, rgb: np.ndarray,
                            mask_output_folder: str) -> Optional[dict]:
        """Tiled high-res step-1 for one image: native-resolution prob map
        (sliding window, Hann blend), type detection, type-aware
        optimization + predict flags at original resolution."""
        oh, ow = rgb.shape[:2]
        s = self.img_size
        probs_full = self._infer_prob_map(rgb)  # (oh, ow) via tiled path
        mask_bin = (probs_full > self.cfg.PREDICT.THRESHOLD).astype(
            np.float32)
        # detect type at model resolution (same stats as the batched path)
        small_rgb = cv2.resize(rgb, (s, s))
        small_mask = cv2.resize(mask_bin, (s, s),
                                interpolation=cv2.INTER_NEAREST)
        score = float(maskproc.detect_watermark_type_scores(
            jnp.asarray(small_rgb, jnp.float32), jnp.asarray(small_mask)))
        mask_type = maskproc.classify_type(score)

        padded, (h, w) = pad_to_multiple(mask_bin, 32)
        opt = maskproc.optimize_mask(
            jnp.asarray(padded), mask_type,
            mode=maskproc.resolve_mask_mode(self.cfg.PREDICT.MASK_MODE,
                                            "artifact"))
        probs_pad, _ = pad_to_multiple(probs_full.astype(np.float32), 32)
        opt = self._apply_predict_flags_batch(
            np.asarray(opt)[None], probs_pad[None])[0]
        mask_full = (opt[:h, :w] * 255).astype(np.uint8)

        stem = os.path.splitext(os.path.basename(path))[0]
        mask_path = os.path.join(mask_output_folder, f"{stem}_mask.png")
        cv2.imwrite(mask_path, mask_full)
        wm_px = int((mask_full > 0).sum())
        if wm_px == 0:
            logger.info("no watermark detected, skipping: %s", stem)
            return None
        return {
            "image_path": path,
            "original_path": path,
            "mask_path": mask_path,
            "mask_type": mask_type,
            "watermark_ratio": wm_px / (oh * ow),
        }

    # ------------------------------------------------------------------
    # batched repair core (predict.py:666-858) — in-process engine
    # ------------------------------------------------------------------
    def _batch_inpaint_repair(self, processed_files: List[dict],
                              output_folder: str, mask_key: str,
                              model_name: str = "lama",
                              skip_condition: Optional[str] = None,
                              skip_threshold: Optional[float] = None,
                              steps: int = 1) -> List[dict]:
        os.makedirs(output_folder, exist_ok=True)
        successful: List[dict] = []
        to_process: List[dict] = []

        for fi in processed_files:
            skip = False
            if skip_condition == "watermark_ratio" and \
                    skip_threshold is not None:
                skip = fi.get("watermark_ratio", 1.0) < skip_threshold
            elif skip_condition == "text_pixels":
                skip = fi.get("text_pixels", 1) == 0
            if skip:
                stem = os.path.splitext(os.path.basename(
                    fi.get("original_path", fi["image_path"])))[0]
                out = os.path.join(output_folder, f"{stem}.png")
                shutil.copy2(fi["image_path"], out)
                successful.append({**fi, "image_path": out})
                logger.info("skip repair (below threshold): %s", stem)
            else:
                to_process.append(fi)
        if not to_process:
            return successful

        engine = get_engine(model_name if self._engine_name is None
                            else self._engine_name, cfg=self.cfg)

        # bucket by padded shape → batch within bucket (static shapes)
        buckets: Dict[Tuple[int, int], List[dict]] = {}
        for fi in to_process:
            img = cv2.imread(fi["image_path"])
            if img is None:
                self._fallback_copy(fi, output_folder, successful)
                continue
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            mask_path = fi.get(mask_key)
            mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE) \
                if mask_path else None
            if mask is None:
                self._fallback_copy(fi, output_folder, successful)
                continue
            if mask.shape[:2] != rgb.shape[:2]:
                mask = cv2.resize(mask, (rgb.shape[1], rgb.shape[0]),
                                  interpolation=cv2.INTER_NEAREST)
            padded_img, orig = pad_to_multiple(
                rgb.astype(np.float32) / 255.0, 32)
            padded_mask, _ = pad_to_multiple(
                (mask > 127).astype(np.float32), 32)
            key = padded_img.shape[:2]
            buckets.setdefault(key, []).append(
                {**fi, "_img": padded_img, "_mask": padded_mask,
                 "_orig": orig})

        from ..utils.batching import make_buckets, pad_to_bucket

        batch_buckets = make_buckets(self.cfg.PREDICT.BATCH_SIZE)
        for key, items in buckets.items():
            bs = max(1, min(len(items), self.cfg.PREDICT.BATCH_SIZE))
            for i in range(0, len(items), bs):
                group = items[i:i + bs]
                # pad the group to a power-of-two bucket: one compiled
                # engine graph per (shape, bucket) instead of per group size
                padded_n = pad_to_bucket(len(group), batch_buckets)
                imgs_np = np.stack([g["_img"] for g in group])
                msks_np = np.stack([g["_mask"] for g in group])[..., None]
                if padded_n > len(group):
                    reps = padded_n - len(group)
                    imgs_np = np.concatenate(
                        [imgs_np, np.repeat(imgs_np[-1:], reps, 0)])
                    msks_np = np.concatenate(
                        [msks_np, np.zeros((reps,) + msks_np.shape[1:],
                                           msks_np.dtype)])
                imgs = jnp.asarray(imgs_np)
                msks = jnp.asarray(msks_np)
                try:
                    out = imgs
                    for _ in range(max(1, steps)):
                        out = engine(out, msks)
                    out = np.asarray(out)[:len(group)]
                except Exception as e:  # noqa: BLE001
                    logger.error("inpaint engine failed (%s); copying "
                                 "originals", e)
                    for g in group:
                        self._fallback_copy(g, output_folder, successful)
                    continue
                for j, g in enumerate(group):
                    oh, ow = g["_orig"]
                    rgb = (np.clip(out[j][:oh, :ow], 0, 1) * 255).astype(
                        np.uint8)
                    stem = os.path.splitext(os.path.basename(
                        g.get("original_path", g["image_path"])))[0]
                    final = os.path.join(output_folder, f"{stem}.png")
                    cv2.imwrite(final, cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
                    successful.append(
                        {k: v for k, v in g.items()
                         if not k.startswith("_")} | {"image_path": final})
        return successful

    @staticmethod
    def _fallback_copy(fi: dict, output_folder: str,
                       successful: List[dict]) -> None:
        stem = os.path.splitext(os.path.basename(
            fi.get("original_path", fi["image_path"])))[0]
        out = os.path.join(output_folder, f"{stem}.png")
        try:
            shutil.copy2(fi["image_path"], out)
        except Exception as e:  # noqa: BLE001
            logger.error("fallback copy failed for %s: %s", stem, e)
            return
        successful.append({k: v for k, v in fi.items()
                           if not k.startswith("_")} | {"image_path": out})
        logger.error("used original as fallback: %s", stem)

    def step2_batch_iopaint_watermark_repair(
            self, processed_files, step2_output_folder,
            model_name: str = "lama", timeout: int = 300,
            steps: int = 1) -> List[dict]:
        logger.info("step2: watermark repair (%s)", model_name)
        return self._batch_inpaint_repair(
            processed_files, step2_output_folder, "mask_path", model_name,
            skip_condition="watermark_ratio", skip_threshold=0.001,
            steps=steps)

    # ------------------------------------------------------------------
    # STEP 3 (predict.py:880-976): OCR text masks
    # ------------------------------------------------------------------
    def step3_batch_extract_text_masks(
            self, processed_files, text_mask_output_folder,
            ocr_languages=None, ocr_engine: str = "easy") -> List[dict]:
        os.makedirs(text_mask_output_folder, exist_ok=True)
        try:
            from ..ocr import get_ocr_detector
            detector = get_ocr_detector(ocr_engine)
        except Exception as e:  # noqa: BLE001
            logger.error("OCR unavailable: %s", e)
            return []

        from tqdm import tqdm
        successful = []
        for fi in tqdm(processed_files, desc="step3 OCR", unit="img"):
            try:
                image_path = fi["image_path"]
                img = cv2.imread(image_path)
                if img is None:
                    continue
                h, w = img.shape[:2]
                regions = detector.detect_text_regions(
                    image_path, languages=ocr_languages) \
                    if ocr_languages else \
                    detector.detect_text_regions(image_path)
                text_mask = np.zeros((h, w), np.uint8)
                for region in regions or []:
                    bbox = region.get("bbox")
                    if bbox is None:
                        continue
                    if len(bbox) == 4:
                        x, y, bw, bh = (int(v) for v in bbox)
                        cv2.rectangle(text_mask, (x, y), (x + bw, y + bh),
                                      255, -1)
                    elif len(bbox) == 8:
                        pts = np.array(bbox).reshape(-1, 2).astype(np.int32)
                        cv2.fillPoly(text_mask, [pts], 255)
                if (text_mask > 0).any():
                    from ..ops import morphology as m
                    dil = m.dilate(
                        jnp.asarray((text_mask > 0).astype(np.float32)),
                        m.ellipse_kernel(5, 5), 2)
                    text_mask = (np.asarray(dil) * 255).astype(np.uint8)
                stem = os.path.splitext(os.path.basename(
                    fi["original_path"]))[0]
                tm_path = os.path.join(text_mask_output_folder,
                                       f"{stem}_text_mask.png")
                cv2.imwrite(tm_path, text_mask)
                text_pixels = int((text_mask > 0).sum())
                if text_pixels == 0:
                    logger.info("no text detected, skipping: %s", stem)
                    continue
                successful.append({
                    "image_path": image_path,
                    "original_path": fi["original_path"],
                    "text_mask_path": tm_path,
                    "text_pixels": text_pixels,
                    "watermark_ratio": fi.get("watermark_ratio", 0.0),
                })
            except Exception as e:  # noqa: BLE001
                logger.error("OCR failed on %s: %s", fi.get("image_path"), e)
        logger.info("step3 done: %d with text / %d", len(successful),
                    len(processed_files))
        return successful

    def step4_batch_iopaint_text_repair(
            self, processed_files, final_output_folder,
            model_name: str = "lama", timeout: int = 600,
            steps: int = 1) -> List[dict]:
        logger.info("step4: text repair (%s)", model_name)
        out = self._batch_inpaint_repair(
            processed_files, final_output_folder, "text_mask_path",
            model_name, skip_condition="text_pixels", steps=steps)
        return [{
            "original_path": fi["original_path"],
            "final_path": fi["image_path"],
            "watermark_ratio": fi.get("watermark_ratio", 0.0),
            "text_pixels": fi.get("text_pixels", 0),
        } for fi in out]

    # ------------------------------------------------------------------
    # STEP 5 (predict.py:1008-1105): merge masks
    # ------------------------------------------------------------------
    def merge_masks_for_video(self, step1_results, step3_results,
                              merged_mask_output_folder) -> List[dict]:
        os.makedirs(merged_mask_output_folder, exist_ok=True)
        text_by_stem = {}
        for fi in step3_results or []:
            stem = os.path.splitext(os.path.basename(
                fi["original_path"]))[0]
            text_by_stem[stem] = fi["text_mask_path"]
        merged = []
        for fi in step1_results:
            try:
                image_path = fi.get("image_path", fi["original_path"])
                stem = os.path.splitext(os.path.basename(image_path))[0]
                mask_path = fi.get("mask_path")
                if not mask_path or not os.path.exists(mask_path):
                    continue  # skipped in step1 (no watermark detected)
                wm = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
                if wm is None:
                    continue
                out = wm.copy()
                tm_path = text_by_stem.get(stem)
                if tm_path and os.path.exists(tm_path):
                    tm = cv2.imread(tm_path, cv2.IMREAD_GRAYSCALE)
                    if tm is not None:
                        if tm.shape != wm.shape:
                            tm = cv2.resize(tm, (wm.shape[1], wm.shape[0]))
                        out = np.maximum(wm, tm)
                padded, (h, w) = pad_to_multiple(
                    (out > 127).astype(np.float32), 32)
                opt = maskproc.optimize_mask(
                    jnp.asarray(padded), "watermark",
                    mode=maskproc.resolve_mask_mode(
                        self.cfg.PREDICT.MASK_MODE, "repair"))
                out_u8 = (np.asarray(opt)[:h, :w] * 255).astype(np.uint8)
                merged_path = os.path.join(merged_mask_output_folder,
                                           f"{stem}.png")
                cv2.imwrite(merged_path, out_u8)
                px = int((out_u8 > 0).sum())
                merged.append({
                    "original_path": image_path,
                    "watermark_mask_path": fi["mask_path"],
                    "text_mask_path": tm_path,
                    "merged_mask_path": merged_path,
                    "mask_ratio": px / out_u8.size,
                    "mask_pixels": px,
                })
            except Exception as e:  # noqa: BLE001
                logger.error("mask merge failed: %s", e)
        return merged

    # ------------------------------------------------------------------
    # orchestration (predict.py:1107-1331)
    # ------------------------------------------------------------------
    def process_folder_batch(self, input_folder: str, output_folder: str,
                             watermark_model: str = "lama",
                             text_model: str = "lama",
                             use_unet: bool = True, use_ocr: bool = True,
                             ocr_languages=None, ocr_engine: str = "easy",
                             timeout: int = 300,
                             save_intermediate: bool = True,
                             merge_masks: bool = True,
                             limit: Optional[int] = None,
                             steps: int = 3) -> Dict:
        start = time.time()
        os.makedirs(output_folder, exist_ok=True)
        if save_intermediate:
            mask_folder = os.path.join(output_folder, "step1_masks")
            step2_folder = os.path.join(output_folder,
                                        "step2_watermark_repaired")
            text_mask_folder = os.path.join(output_folder,
                                            "step3_text_masks")
        else:
            import tempfile
            tmp = tempfile.mkdtemp(prefix="batch_watermark_removal_")
            mask_folder = os.path.join(tmp, "masks")
            step2_folder = os.path.join(tmp, "step2")
            text_mask_folder = os.path.join(tmp, "text_masks")
        final_folder = output_folder

        step3_results: List[dict] = []
        if use_unet:
            step1_results = self.step1_batch_predict_watermark_masks(
                input_folder, mask_folder, limit=limit)
            if step1_results:
                step2_results = self.step2_batch_iopaint_watermark_repair(
                    step1_results, step2_folder, watermark_model, timeout,
                    steps)
                if not step2_results:
                    return {"status": "error",
                            "message": "step2 failed: watermark repair"}
            else:
                step1_results, step2_results = self._passthrough(
                    input_folder, step2_folder, limit)
        else:
            logger.info("skipping UNet detection")
            step1_results, step2_results = self._passthrough(
                input_folder, step2_folder, limit)
            if not step1_results:
                return {"status": "error", "message": "no images found"}

        if use_ocr:
            step3_results = self.step3_batch_extract_text_masks(
                step2_results, text_mask_folder, ocr_languages, ocr_engine)
            if step3_results:
                step4_results = self.step4_batch_iopaint_text_repair(
                    step3_results, final_folder, text_model, timeout, steps)
                done = {fi["original_path"] for fi in step3_results}
                for fi in step2_results:
                    if fi["original_path"] not in done:
                        stem = os.path.splitext(os.path.basename(
                            fi["original_path"]))[0]
                        final = os.path.join(final_folder, f"{stem}.png")
                        shutil.copy2(fi["image_path"], final)
                        step4_results.append({
                            "original_path": fi["original_path"],
                            "final_path": final,
                            "watermark_ratio": fi.get("watermark_ratio", 0.0),
                            "text_pixels": 0,
                        })
            else:
                logger.warning("step3: no text anywhere; copying step2 out")
                for fi in step2_results:
                    stem = os.path.splitext(os.path.basename(
                        fi["original_path"]))[0]
                    shutil.copy2(fi["image_path"],
                                 os.path.join(final_folder, f"{stem}.png"))
                step4_results = step2_results
        else:
            for fi in step2_results:
                stem = os.path.splitext(os.path.basename(
                    fi["original_path"]))[0]
                shutil.copy2(fi["image_path"],
                             os.path.join(final_folder, f"{stem}.png"))
            step4_results = step2_results

        merged_results = []
        if merge_masks and step1_results and use_unet:
            merged_results = self.merge_masks_for_video(
                step1_results, step3_results,
                os.path.join(output_folder, "masks"))

        dt = time.time() - start
        total = len(step1_results)
        ok = len(step4_results)
        avg_ratio = (sum(f.get("watermark_ratio", 0) for f in step1_results)
                     / total if use_unet and total else 0.0)
        avg_text = (sum(f["text_pixels"] for f in step3_results) /
                    len(step3_results) if step3_results else 0.0)
        stats = {
            "status": "success",
            "total_images": total,
            "successful_images": ok,
            "success_rate": ok / total * 100 if total else 0,
            "processing_time": dt,
            "avg_processing_time_per_image": dt / total if total else 0,
            "avg_watermark_ratio": avg_ratio,
            "avg_text_pixels": avg_text,
            "steps_completed": {
                "step1_mask_prediction": len(step1_results),
                "step2_watermark_repair": len(step2_results),
                "step3_text_extraction": len(step3_results),
                "step4_text_repair": len(step4_results),
                "merged_masks": len(merged_results),
            },
        }
        logger.info("batch done: %d/%d ok in %.1fs", ok, total, dt)
        return stats

    def _passthrough(self, input_folder, step2_folder, limit):
        image_files = self._get_image_files(input_folder, limit=limit)
        step1, step2 = [], []
        os.makedirs(step2_folder, exist_ok=True)
        for p in image_files:
            stem = os.path.splitext(os.path.basename(p))[0]
            out = os.path.join(step2_folder, f"{stem}.png")
            shutil.copy2(p, out)
            step1.append({"original_path": p, "mask_path": None,
                          "watermark_ratio": 0.0})
            step2.append({"original_path": p, "image_path": out,
                          "watermark_ratio": 0.0})
        return step1, step2

    # ------------------------------------------------------------------
    # fused single-graph detect→inpaint (BASELINE north star)
    # ------------------------------------------------------------------
    def make_fused_repair_fn(self, inpaint_engine: str = "lama",
                             smooth_iterations: int = 32):
        """Returns a jitted fn: (N,S,S,3) [0,1] → repaired images; the
        whole detect→threshold→optimize→inpaint path in ONE XLA graph.

        With inpaint_engine in {lama, big-lama, mat} and resolvable trained
        weights (engines.resolve_inpaint_weights), the fill is the learned
        FFC generator — matching the reference's always-learned repair
        (predict.py:771-777); otherwise the push-pull fill. The fn's
        `.engine_used` attribute reports which one actually compiled."""
        from ..ops.inpaint import inpaint_pushpull
        from .engines import resolve_inpaint_weights

        apply_model = self._apply_model  # honors the int8 PREDICT.QUANT tier
        threshold = self.cfg.PREDICT.THRESHOLD

        lama_apply = None
        engine_used = "pushpull"
        if inpaint_engine in ("lama", "big-lama", "mat"):
            wp = resolve_inpaint_weights(cfg=self.cfg)
            if wp and os.path.exists(wp):
                # the SAME loader get_engine uses (npz/orbax agnostic) —
                # a private restore here is how round 2 silently dropped
                # the shipped bf16 .npz and benched push-pull instead
                from .engines import load_lama_variables

                lm, lv, cand = load_lama_variables(wp, inpaint_engine)
                if lv is not None:
                    lama_apply = functools.partial(
                        lm.apply, lv, train=False)
                    engine_used = f"ffc-{cand}"
            if lama_apply is None:
                logger.warning("fused repair: no trained weights for '%s' "
                               "— using pushpull fill", inpaint_engine)

        repair_mode = maskproc.resolve_mask_mode(
            self.cfg.PREDICT.MASK_MODE, "repair")
        optimize = (maskproc.optimize_watermark_mask_tight
                    if repair_mode == "tight"
                    else maskproc.optimize_watermark_mask)

        @jax.jit
        def fused(images_01):
            norm = (images_01 - IMAGENET_MEAN) / IMAGENET_STD
            logits = apply_model(norm)
            probs = jax.nn.sigmoid(logits[..., 0])
            masks = (probs > threshold).astype(jnp.float32)
            opt = jax.vmap(optimize)(masks)
            if lama_apply is not None:
                return lama_apply(images_01, opt[..., None])
            return inpaint_pushpull(images_01, opt[..., None],
                                    smooth_iterations=smooth_iterations)

        fused.engine_used = engine_used
        return fused
