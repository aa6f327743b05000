"""Common OCR detector interface.

Region dicts follow the reference's normalized format
(/root/reference/src/ocr/easy_ocr.py:178-194): bbox is either
[x, y, w, h] or the 8-coordinate polygon [x1,y1,...,x4,y4], plus text and
confidence.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Union

import cv2
import numpy as np

TextRegion = Dict


class OCRDetector:
    """Base class: implement detect_text_regions; mask helpers shared."""

    image_extensions = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif"}

    def detect_text_regions(self, image_path,
                            languages: Optional[Sequence[str]] = None
                            ) -> List[TextRegion]:
        raise NotImplementedError

    # ------------------------------------------------------------------
    def generate_text_mask(self, image_input,
                           output_path: Optional[str] = None,
                           languages: Optional[Sequence[str]] = None
                           ) -> Optional[np.ndarray]:
        """Polygon-fill text regions into a binary mask
        (easy_ocr.py:52-156 contract; accepts a path or a PIL image)."""
        img, path = self._load(image_input)
        if img is None:
            return None
        regions = self.detect_text_regions(path if path else img,
                                           languages=languages)
        h, w = img.shape[:2]
        mask = np.zeros((h, w), np.uint8)
        for region in regions or []:
            bbox = region.get("bbox")
            if bbox is None:
                continue
            if len(bbox) == 8:
                pts = np.array(bbox).reshape(-1, 2).astype(np.int32)
                cv2.fillPoly(mask, [pts], 255)
            elif len(bbox) == 4:
                x, y, bw, bh = (int(v) for v in bbox)
                cv2.rectangle(mask, (x, y), (x + bw, y + bh), 255, -1)
        if output_path:
            cv2.imwrite(output_path, mask)
        return mask

    def batch_process(self, input_folder: str, output_folder: str,
                      limit: Optional[int] = None,
                      random_seed: int = 42) -> Dict:
        """Folder batch with skip-done + seeded random limit
        (easy_ocr.py:215-340 contract)."""
        import random as _random

        os.makedirs(output_folder, exist_ok=True)
        files = sorted(
            p for p in (os.path.join(input_folder, f)
                        for f in os.listdir(input_folder))
            if os.path.splitext(p)[1].lower() in self.image_extensions)
        todo = [p for p in files if not os.path.exists(self._out_path(
            output_folder, p))]
        if limit is not None and 0 < limit < len(todo):
            _random.Random(random_seed).shuffle(todo)
            todo = todo[:limit]
        ok = failed = 0
        for p in todo:
            mask = self.generate_text_mask(p, self._out_path(output_folder, p))
            if mask is None:
                failed += 1
            else:
                ok += 1
        return {"total": len(files), "processed": ok, "failed": failed,
                "skipped": len(files) - len(todo)}

    @staticmethod
    def _out_path(output_folder: str, image_path: str) -> str:
        stem = os.path.splitext(os.path.basename(image_path))[0]
        return os.path.join(output_folder, f"{stem}_mask.png")

    @staticmethod
    def _load(image_input):
        """Accept path or PIL image (the test_ocr_fix.py regression:
        PIL inputs must work)."""
        if isinstance(image_input, (str, os.PathLike)):
            return cv2.imread(str(image_input)), str(image_input)
        try:  # PIL image
            arr = np.array(image_input)
            if arr.ndim == 3 and arr.shape[2] == 3:
                arr = cv2.cvtColor(arr, cv2.COLOR_RGB2BGR)
            return arr, None
        except Exception:  # noqa: BLE001
            return None, None
