"""Text-watermark environment diagnosis — analog of
/root/reference/src/text/diagnose_text_watermark.py (:18-260) and
setup_text_watermark.py (:19).

Checks font availability and text rendering, OCR backend presence, the
text config, and the device-side text mask pipeline, printing suggested
fixes for anything missing.
"""
from __future__ import annotations

import argparse
import logging
import os
from typing import Dict, List

logger = logging.getLogger(__name__)


def diagnose_fonts() -> Dict:
    from ..data.gen_data import generate_text_content, load_system_fonts

    fonts = load_system_fonts()
    renderable = 0
    samples = []
    from PIL import Image, ImageDraw, ImageFont

    for fp in fonts[:20]:
        try:
            font = ImageFont.truetype(fp, 24)
            img = Image.new("RGB", (200, 40))
            ImageDraw.Draw(img).text((2, 2), "Test WATERMARK 123",
                                     font=font)
            renderable += 1
            samples.append(fp)
        except Exception:  # noqa: BLE001
            continue
    result = {
        "fonts_found": len(fonts),
        "fonts_renderable_sampled": renderable,
        "sample_fonts": samples[:5],
        "sample_text": generate_text_content(),
    }
    if not fonts:
        result["fix"] = ("no TTF fonts found — install fonts or text "
                         "watermarks fall back to PIL's bitmap default "
                         "(small glyphs)")
    return result


def diagnose_ocr() -> Dict:
    out: Dict = {}
    try:
        import easyocr  # noqa: F401
        out["easyocr"] = "available"
    except ImportError:
        out["easyocr"] = ("missing — 'easy' engine falls back to the "
                          "builtin morphological detector")
    try:
        import requests

        from ..ocr.paddle_ocr import DEFAULT_API_URL
        resp = requests.get(DEFAULT_API_URL.rsplit("/", 1)[0],
                            timeout=2)
        out["paddle_service"] = f"reachable (HTTP {resp.status_code})"
    except Exception as e:  # noqa: BLE001
        out["paddle_service"] = f"unreachable ({type(e).__name__})"
    out["builtin"] = "available"
    return out


def diagnose_pipeline() -> Dict:
    """Render text → builtin OCR → device text-mask optimization."""
    import numpy as np
    from PIL import Image, ImageDraw

    import jax.numpy as jnp

    from ..inference import maskproc
    from ..ocr import BuiltinTextDetector

    img = Image.new("RGB", (256, 128), (30, 30, 30))
    ImageDraw.Draw(img).text((40, 60), "WATERMARK TEXT 2024",
                             fill=(255, 255, 255))
    det = BuiltinTextDetector()
    mask = det.generate_text_mask(img)
    found = bool(mask is not None and (mask > 0).any())
    result = {"builtin_ocr_found_text": found}
    if found:
        opt = maskproc.optimize_text_mask(
            jnp.asarray((mask > 0).astype(np.float32)))
        result["optimized_mask_coverage"] = float(
            np.asarray(opt).mean())
    return result


def run_all() -> Dict:
    return {
        "fonts": diagnose_fonts(),
        "ocr": diagnose_ocr(),
        "pipeline": diagnose_pipeline(),
    }


def main(argv=None):
    logging.basicConfig(level=logging.INFO, force=True)
    p = argparse.ArgumentParser(description="text watermark diagnosis")
    p.parse_args(argv)
    import json

    print(json.dumps(run_all(), indent=2))


if __name__ == "__main__":
    main()
