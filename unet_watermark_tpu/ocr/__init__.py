"""OCR backends — host-side text detectors behind one interface.

The reference uses EasyOCR in-process and PaddleOCR over HTTP
(/root/reference/src/ocr/, SURVEY.md §7.1 layer 8). OCR engines are
external C++/paddle systems and cannot be TPU-native (SURVEY.md §7.3), so
they stay host-side, isolated behind `detect_text_regions()` — the device
graph only consumes the rasterized boxes.

Engines:
  * "easy"    — EasyOCRDetector (gated import; easyocr is optional)
  * "paddle"  — PaddleOCRProcessor, HTTP client to a PaddleX service
  * "builtin" — dependency-free MSER/gradient detector (cv2 only); also
                the automatic fallback when easyocr is absent
"""
from .base import OCRDetector, TextRegion
from .builtin import BuiltinTextDetector
from .easy_ocr import EasyOCRDetector
from .paddle_ocr import PaddleOCRDetector, PaddleOCRProcessor


def get_ocr_detector(engine: str = "easy", **kwargs) -> OCRDetector:
    engine = (engine or "easy").lower()
    if engine == "paddle":
        return PaddleOCRProcessor(**kwargs)
    if engine == "builtin":
        return BuiltinTextDetector(**kwargs)
    if engine == "easy":
        try:
            det = EasyOCRDetector(**kwargs)
            det.ensure_available()
            return det
        except ImportError:
            import logging
            logging.getLogger(__name__).warning(
                "easyocr not installed; using builtin text detector")
            return BuiltinTextDetector()
    raise ValueError(f"unknown OCR engine '{engine}'")


__all__ = [
    "OCRDetector",
    "TextRegion",
    "BuiltinTextDetector",
    "EasyOCRDetector",
    "PaddleOCRDetector",
    "PaddleOCRProcessor",
    "get_ocr_detector",
]
