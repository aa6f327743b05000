"""Dependency-free text-region detector (cv2 MSER + geometric filtering).

No reference counterpart: exists so the text pipeline runs end-to-end when
neither easyocr nor a PaddleOCR service is available (zero-egress TPU
pods). Finds character-like stable regions with MSER, groups them into
lines, and returns [x, y, w, h] boxes in the shared region format. Tuned
for watermark-style overlay text — recall over precision, since boxes feed
an inpainter rather than a recognizer.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import cv2
import numpy as np

from .base import OCRDetector, TextRegion


class BuiltinTextDetector(OCRDetector):
    def __init__(self, min_area: int = 30, max_area_ratio: float = 0.05,
                 merge_gap: float = 1.2):
        self.min_area = min_area
        self.max_area_ratio = max_area_ratio
        self.merge_gap = merge_gap

    def detect_text_regions(self, image_path,
                            languages: Optional[Sequence[str]] = None
                            ) -> List[TextRegion]:
        del languages
        img, _ = self._load(image_path)
        if img is None:
            return []
        gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY)
        h, w = gray.shape

        # stroke edges: morphological gradient + Otsu
        grad = cv2.morphologyEx(
            gray, cv2.MORPH_GRADIENT,
            cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3)))
        _, bw_img = cv2.threshold(grad, 0, 255,
                                  cv2.THRESH_BINARY | cv2.THRESH_OTSU)
        # join letters into line blobs
        joined = cv2.morphologyEx(
            bw_img, cv2.MORPH_CLOSE,
            cv2.getStructuringElement(cv2.MORPH_RECT, (9, 3)))
        contours, _ = cv2.findContours(joined, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        boxes = []
        max_area = h * w * self.max_area_ratio
        for c in contours:
            x, y, bw_, bh = cv2.boundingRect(c)
            area = bw_ * bh
            if area < self.min_area or area > max_area * 10:
                continue
            aspect = bw_ / max(bh, 1)
            # text lines are wide-ish, limited height, dense in edges
            fill = cv2.countNonZero(bw_img[y:y + bh, x:x + bw_]) / max(area, 1)
            if 0.8 <= aspect <= 30 and bh < h * 0.3 and fill > 0.15:
                boxes.append([x, y, bw_, bh])
        boxes = self._merge_lines(boxes)
        return [{"bbox": [float(v) for v in b], "text": "",
                 "confidence": 0.5} for b in boxes]

    def _merge_lines(self, boxes: List[List[int]]) -> List[List[int]]:
        """Greedy merge of horizontally-adjacent character boxes into
        line boxes."""
        boxes = sorted(boxes, key=lambda b: (b[1], b[0]))
        merged: List[List[int]] = []
        for b in boxes:
            placed = False
            for mitem in merged:
                mx, my, mw, mh = mitem
                bx, by, bw, bh = b
                same_line = abs((by + bh / 2) - (my + mh / 2)) < \
                    max(mh, bh) * 0.6
                gap = bx - (mx + mw)
                if same_line and gap < max(mh, bh) * self.merge_gap and \
                        gap > -max(mw, bw):
                    nx = min(mx, bx)
                    ny = min(my, by)
                    nx2 = max(mx + mw, bx + bw)
                    ny2 = max(my + mh, by + bh)
                    mitem[:] = [nx, ny, nx2 - nx, ny2 - ny]
                    placed = True
                    break
            if not placed:
                merged.append(list(b))
        return merged
