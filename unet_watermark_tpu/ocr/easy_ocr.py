"""EasyOCR backend — analog of /root/reference/src/ocr/easy_ocr.py.

Lazy-initializes the Reader (en/ch_sim default, :30-49) and normalizes
results to 8-coordinate polygon regions (:178-194). The easyocr import is
gated: the package is optional in this image.
"""
from __future__ import annotations

import logging
from typing import List, Optional, Sequence

import numpy as np

from .base import OCRDetector, TextRegion

logger = logging.getLogger(__name__)


class EasyOCRDetector(OCRDetector):
    def __init__(self, languages: Optional[Sequence[str]] = None,
                 gpu: bool = False, verbose: bool = False):
        self.languages = list(languages) if languages else ["en", "ch_sim"]
        self.gpu = gpu
        self.verbose = verbose
        self.reader = None

    def ensure_available(self) -> None:
        import easyocr  # noqa: F401

    def _init_reader(self):
        if self.reader is None:
            import easyocr
            logger.info("initializing EasyOCR reader (%s)", self.languages)
            self.reader = easyocr.Reader(self.languages, gpu=self.gpu,
                                         verbose=self.verbose)

    def detect_text_regions(self, image_path,
                            languages: Optional[Sequence[str]] = None
                            ) -> List[TextRegion]:
        img, path = self._load(image_path)
        if img is None:
            return []
        if languages and list(languages) != self.languages:
            self.languages = list(languages)
            self.reader = None
        self._init_reader()
        results = self.reader.readtext(img if path is None else path)
        regions: List[TextRegion] = []
        for bbox, text, conf in results:
            if len(bbox) == 4 and len(bbox[0]) == 2:
                flat = [float(c) for point in bbox for c in point]
                regions.append({"bbox": flat, "text": text,
                                "confidence": float(conf)})
        return regions
