"""FLUX Kontext watermark removal — analog of
/root/reference/src/flux/flux_process.py and flux_process_nunchaku.py.

Prompt-based watermark removal via FLUX.1-Kontext (flux_process.py:82-103),
OCR-gated text removal with the 0.001-0.5 ratio gate (:128-246,158), size
normalization to 512-1024 multiples of 8 (:249-284), batch mode and
comparison video (:324-390,390+). Quantized-transformer variant maps to a
`quantized=True` flag (flux_process_nunchaku.py:23).

Gated on diffusers: absent (this image), every removal call falls back to
the in-process engines so the API surface stays operational.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)

DEFAULT_MODEL = "black-forest-labs/FLUX.1-Kontext-dev"
RATIO_GATE = (0.001, 0.5)  # flux_process.py:158


def normalize_size(w: int, h: int, min_side: int = 512,
                   max_side: int = 1024, multiple: int = 8
                   ) -> Tuple[int, int]:
    """flux_process.py:249-284: clamp to [512, 1024], multiples of 8,
    preserving aspect."""
    scale = 1.0
    long_side = max(w, h)
    short_side = min(w, h)
    if long_side > max_side:
        scale = max_side / long_side
    elif short_side < min_side:
        scale = min_side / short_side
    nw, nh = int(w * scale), int(h * scale)
    nw = max((nw // multiple) * multiple, multiple)
    nh = max((nh // multiple) * multiple, multiple)
    return nw, nh


class FluxProcessor:
    def __init__(self, model_name: str = DEFAULT_MODEL,
                 quantized: bool = False,
                 prompt: str = ("remove the watermark and restore the "
                                "underlying image, photorealistic"),
                 ocr_engine: str = "builtin"):
        self.model_name = model_name
        self.quantized = quantized
        self.prompt = prompt
        self.ocr_engine = ocr_engine
        self._pipe = None

    def init_model(self):
        """flux_process.py:36-80 / nunchaku :39 analog."""
        if self._pipe is not None:
            return self._pipe
        try:
            import torch
            from diffusers import FluxKontextPipeline

            kwargs = {"torch_dtype": torch.bfloat16}
            if self.quantized:
                try:
                    from nunchaku import NunchakuFluxTransformer2dModel

                    kwargs["transformer"] = \
                        NunchakuFluxTransformer2dModel.from_pretrained(
                            self.model_name)
                except ImportError:
                    logger.warning("nunchaku unavailable; full precision")
            self._pipe = FluxKontextPipeline.from_pretrained(
                self.model_name, **kwargs)
            return self._pipe
        except Exception as e:  # noqa: BLE001
            logger.warning("FLUX pipeline unavailable (%s); in-process "
                           "engine fallback active", e)
            return None

    # ------------------------------------------------------------------
    def _fallback(self, image_bgr: np.ndarray,
                  mask: Optional[np.ndarray]) -> np.ndarray:
        import jax.numpy as jnp

        from ..inference.engines import get_engine
        from ..inference.tiled import pad_to_multiple

        if mask is None or not (mask > 0).any():
            return image_bgr
        # native latent diffusion before the non-generative fast fill
        from .latent_diffusion import diffusion_inpaint_bgr

        native = diffusion_inpaint_bgr(image_bgr, mask)
        if native is not None:
            return native
        rgb = cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB).astype(
            np.float32) / 255.0
        padded, (h, w) = pad_to_multiple(rgb, 32)
        pmask, _ = pad_to_multiple((mask > 127).astype(np.float32), 32)
        out = get_engine("pushpull")(jnp.asarray(padded[None]),
                                     jnp.asarray(pmask[None, ..., None]))
        out = (np.clip(np.asarray(out)[0][:h, :w], 0, 1) * 255).astype(
            np.uint8)
        return cv2.cvtColor(out, cv2.COLOR_RGB2BGR)

    def remove_watermark(self, image_bgr: np.ndarray,
                         prompt: Optional[str] = None) -> np.ndarray:
        """Prompt-based removal (flux_process.py:82-103)."""
        pipe = self.init_model()
        h, w = image_bgr.shape[:2]
        nw, nh = normalize_size(w, h)
        if pipe is None:
            # no diffusion: detect text regions and fast-inpaint them
            from PIL import Image

            from ..ocr import get_ocr_detector

            det = get_ocr_detector(self.ocr_engine)
            mask = det.generate_text_mask(Image.fromarray(
                cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB)))
            return self._fallback(image_bgr, mask)
        from PIL import Image

        img = Image.fromarray(cv2.cvtColor(
            cv2.resize(image_bgr, (nw, nh)), cv2.COLOR_BGR2RGB))
        out = pipe(image=img, prompt=prompt or self.prompt).images[0]
        out = cv2.cvtColor(np.array(out), cv2.COLOR_RGB2BGR)
        return cv2.resize(out, (w, h))

    def remove_text_watermark(self, image_bgr: np.ndarray
                              ) -> Tuple[np.ndarray, Dict]:
        """OCR-gated removal (flux_process.py:128-246): only act when the
        text-mask ratio is inside the (0.001, 0.5) gate."""
        from PIL import Image

        from ..ocr import get_ocr_detector

        det = get_ocr_detector(self.ocr_engine)
        mask = det.generate_text_mask(Image.fromarray(
            cv2.cvtColor(image_bgr, cv2.COLOR_BGR2RGB)))
        ratio = float((mask > 0).mean()) if mask is not None else 0.0
        info = {"text_ratio": ratio, "acted": False}
        if not (RATIO_GATE[0] <= ratio <= RATIO_GATE[1]):
            return image_bgr, info
        info["acted"] = True
        pipe = self.init_model()
        if pipe is None:
            return self._fallback(image_bgr, mask), info
        return self.remove_watermark(image_bgr), info

    def process_batch(self, input_dir: str, output_dir: str,
                      limit: Optional[int] = None,
                      mode: str = "text") -> Dict:
        """flux_process.py:324-388."""
        os.makedirs(output_dir, exist_ok=True)
        files = sorted(
            f for f in os.listdir(input_dir)
            if f.lower().endswith((".jpg", ".jpeg", ".png", ".webp")))
        todo = [f for f in files
                if not os.path.exists(os.path.join(output_dir, f))]
        if limit:
            todo = todo[:limit]
        ok = skipped = failed = 0
        for f in todo:
            try:
                img = cv2.imread(os.path.join(input_dir, f))
                if img is None:
                    failed += 1
                    continue
                if mode == "text":
                    out, info = self.remove_text_watermark(img)
                    if not info["acted"]:
                        skipped += 1
                else:
                    out = self.remove_watermark(img)
                cv2.imwrite(os.path.join(output_dir, f), out)
                ok += 1
            except Exception as e:  # noqa: BLE001
                logger.error("flux failed on %s: %s", f, e)
                failed += 1
        return {"total": len(files), "processed": ok, "skipped": skipped,
                "failed": failed}

    def generate_comparison_video(self, original_dir: str,
                                  processed_dir: str,
                                  output_path: str) -> Optional[str]:
        """flux_process.py:390+ — delegates to the shared VideoGenerator."""
        from ..scripts.video_generator import VideoGenerator

        gen = VideoGenerator(width=1280, height=720)
        return gen.create_side_by_side_video(original_dir, processed_dir,
                                             output_path)
