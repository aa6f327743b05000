"""SD3 inpainting backend — analog of /root/reference/src/sd3/inpaint.py
and sd3_pipeline.py.

Keeps the reference's guard rails (inpaint.py:200-360): max_mask_ratio
0.25 overall, 0.08 per region, min region area 200, aspect-ratio filter —
oversized masks skip diffusion and fall back to the fast engine.
Morphological-gradient text detection (:86) reuses ops/morphology.

The diffusers pipeline is gated; on this image (no diffusers, zero egress)
`_fallback_inpaint` serves every call so the API remains functional.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_MODEL = "stabilityai/stable-diffusion-3-medium-diffusers"


def diffusers_available() -> bool:
    try:
        import diffusers  # noqa: F401
        return True
    except ImportError:
        return False


class SDWatermarkRemover:
    """sd3/inpaint.py:18-482 analog."""

    def __init__(self, model_name: str = DEFAULT_MODEL,
                 steps: int = 25, guidance_scale: float = 6.0,
                 strength: float = 0.6,
                 max_mask_ratio: float = 0.25,
                 max_region_ratio: float = 0.08,
                 min_region_area: int = 200,
                 prompt: str = "clean background, high quality photo",
                 negative_prompt: str = "watermark, text, logo, blurry"):
        self.model_name = model_name
        self.steps = steps
        self.guidance_scale = guidance_scale
        self.strength = strength
        self.max_mask_ratio = max_mask_ratio
        self.max_region_ratio = max_region_ratio
        self.min_region_area = min_region_area
        self.prompt = prompt
        self.negative_prompt = negative_prompt
        self._pipe = None

    # ---- model loading with fallback chain (inpaint.py:32-72) -------------
    def _load_pipe(self):
        if self._pipe is not None:
            return self._pipe
        if not diffusers_available():
            return None
        try:
            import torch
            from diffusers import StableDiffusion3InpaintPipeline

            self._pipe = StableDiffusion3InpaintPipeline.from_pretrained(
                self.model_name, torch_dtype=torch.float32)
            self._pipe.enable_attention_slicing()
            return self._pipe
        except Exception as e:  # noqa: BLE001
            logger.warning("SD3 pipeline unavailable (%s); using fast "
                           "inpaint fallback", e)
            return None

    # ---- text-region detection (inpaint.py:86-198) ------------------------
    def detect_text_regions(self, image_bgr: np.ndarray) -> np.ndarray:
        """Morphological-gradient text mask with area/aspect guards."""
        gray = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2GRAY)
        grad = cv2.morphologyEx(
            gray, cv2.MORPH_GRADIENT,
            cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3)))
        _, bw = cv2.threshold(grad, 0, 255,
                              cv2.THRESH_BINARY | cv2.THRESH_OTSU)
        joined = cv2.morphologyEx(
            bw, cv2.MORPH_CLOSE,
            cv2.getStructuringElement(cv2.MORPH_RECT, (9, 3)))
        h, w = gray.shape
        total = h * w
        n, labels, stats, _ = cv2.connectedComponentsWithStats(joined)
        mask = np.zeros((h, w), np.uint8)
        for i in range(1, n):
            area = stats[i, cv2.CC_STAT_AREA]
            bw_, bh = stats[i, cv2.CC_STAT_WIDTH], stats[i,
                                                         cv2.CC_STAT_HEIGHT]
            if area < self.min_region_area:
                continue
            if area / total > self.max_region_ratio:
                continue
            aspect = bw_ / max(bh, 1)
            if not 0.5 <= aspect <= 20:
                continue
            mask[labels == i] = 255
        if (mask > 0).mean() > self.max_mask_ratio:
            logger.info("text mask exceeds max_mask_ratio; clearing")
            return np.zeros((h, w), np.uint8)
        return mask

    # ---- repair ------------------------------------------------------------
    def _fallback_inpaint(self, image_bgr: np.ndarray,
                          mask: np.ndarray) -> np.ndarray:
        # second rung: the native in-framework latent-diffusion engine
        # (diffusion/latent_diffusion.py) — a REAL generative fill when
        # diffusers can't load; fast push-pull only as the last resort
        from .latent_diffusion import diffusion_inpaint_bgr

        native = diffusion_inpaint_bgr(image_bgr, mask, steps=self.steps)
        if native is not None:
            return native

        import jax.numpy as jnp

        from ..inference.engines import get_engine
        from ..inference.tiled import pad_to_multiple

        rgb = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB).astype(
            np.float32) / 255.0
        padded, (h, w) = pad_to_multiple(rgb, 32)
        pmask, _ = pad_to_multiple((mask > 127).astype(np.float32), 32)
        out = get_engine("pushpull")(jnp.asarray(padded[None]),
                                     jnp.asarray(pmask[None, ..., None]))
        out = (np.clip(np.asarray(out)[0][:h, :w], 0, 1) * 255).astype(
            np.uint8)
        return cv2.cvtColor(out, cv2.COLOR_RGB2BGR)

    def remove_watermark_with_mask(self, image_bgr: np.ndarray,
                                   mask: np.ndarray) -> np.ndarray:
        """inpaint.py:200-240 analog."""
        ratio = (mask > 127).mean()
        if ratio == 0:
            return image_bgr
        if ratio > self.max_mask_ratio:
            logger.info("mask ratio %.3f exceeds guard %.3f; fast inpaint",
                        ratio, self.max_mask_ratio)
            return self._fallback_inpaint(image_bgr, mask)
        pipe = self._load_pipe()
        if pipe is None:
            return self._fallback_inpaint(image_bgr, mask)
        from PIL import Image

        img = Image.fromarray(cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB))
        m = Image.fromarray(mask)
        out = pipe(prompt=self.prompt,
                   negative_prompt=self.negative_prompt, image=img,
                   mask_image=m, num_inference_steps=self.steps,
                   guidance_scale=self.guidance_scale,
                   strength=self.strength).images[0]
        return cv2.cvtColor(np.array(out), cv2.COLOR_RGB2BGR)

    def remove_watermark_auto(self, image_bgr: np.ndarray) -> np.ndarray:
        """inpaint.py:242-360: detect text regions, then repair."""
        mask = self.detect_text_regions(image_bgr)
        if not (mask > 0).any():
            return image_bgr
        return self.remove_watermark_with_mask(image_bgr, mask)

    def process_folder(self, input_dir: str, output_dir: str,
                       limit: Optional[int] = None,
                       seed: int = 42) -> Dict:
        """inpaint.py:363-482: folder batch with skip-done + random limit."""
        import random

        os.makedirs(output_dir, exist_ok=True)
        files = sorted(
            f for f in os.listdir(input_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
        todo = [f for f in files
                if not os.path.exists(os.path.join(output_dir, f))]
        if limit and len(todo) > limit:
            random.Random(seed).shuffle(todo)
            todo = todo[:limit]
        ok = failed = 0
        for f in todo:
            try:
                img = cv2.imread(os.path.join(input_dir, f))
                if img is None:
                    failed += 1
                    continue
                out = self.remove_watermark_auto(img)
                cv2.imwrite(os.path.join(output_dir, f), out)
                ok += 1
            except Exception as e:  # noqa: BLE001
                logger.error("failed on %s: %s", f, e)
                failed += 1
        return {"total": len(files), "processed": ok, "failed": failed,
                "skipped": len(files) - len(todo)}


class SD3Pipeline:
    """3-step pipeline — analog of sd3/sd3_pipeline.py: UNet mask →
    fast/LaMa inpaint → optional SD3 polish. In-process instead of
    `iopaint` subprocesses (:43-53)."""

    def __init__(self, model_path: Optional[str] = None, config=None,
                 sd_remover: Optional[SDWatermarkRemover] = None):
        from ..inference import WatermarkPredictor

        self.predictor = WatermarkPredictor(model_path=model_path,
                                            config=config)
        self.sd = sd_remover or SDWatermarkRemover()

    def run(self, image_path: str, output_path: str,
            use_sd_polish: bool = True) -> str:
        img = cv2.imread(image_path)
        if img is None:
            raise ValueError(f"cannot read {image_path}")
        mask = self.predictor.predict_mask(image_path)
        repaired = self.sd._fallback_inpaint(img, mask)
        if use_sd_polish and diffusers_available():
            repaired = self.sd.remove_watermark_with_mask(repaired, mask)
        cv2.imwrite(output_path, repaired)
        return output_path
