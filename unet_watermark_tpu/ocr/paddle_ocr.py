"""PaddleOCR backend — HTTP client to a PaddleX OCR service.

Analog of /root/reference/src/ocr/paddle_ocr.py: base64 POST (:122-149),
region extraction preferring dt_polys > rec_polys > rec_boxes (:66-98,
:259-307), same detect_text_regions interface, PaddleOCRDetector alias.
"""
from __future__ import annotations

import base64
import logging
from typing import Any, Dict, List, Optional, Sequence

from .base import OCRDetector, TextRegion

logger = logging.getLogger(__name__)

DEFAULT_API_URL = "http://127.0.0.1:8080/ocr"


class PaddleOCRProcessor(OCRDetector):
    def __init__(self, api_url: str = DEFAULT_API_URL, timeout: float = 30.0):
        self.api_url = api_url
        self.timeout = timeout

    def ocr_request(self, image_path: str) -> Optional[Dict[str, Any]]:
        import requests

        with open(image_path, "rb") as f:
            file_data = base64.b64encode(f.read()).decode("ascii")
        payload = {"file": file_data, "fileType": 1}
        try:
            resp = requests.post(self.api_url, json=payload,
                                 timeout=self.timeout)
            if resp.status_code == 200:
                return resp.json()["result"]
            logger.error("OCR service HTTP %d for %s", resp.status_code,
                         image_path)
        except Exception as e:  # noqa: BLE001
            logger.error("OCR request failed for %s: %s", image_path, e)
        return None

    def detect_text_regions(self, image_path,
                            languages: Optional[Sequence[str]] = None
                            ) -> List[TextRegion]:
        del languages  # the service is language-configured server-side
        result = self.ocr_request(str(image_path))
        if not result:
            return []
        regions: List[TextRegion] = []
        for ocr_res in result.get("ocrResults", []) or []:
            pruned = ocr_res.get("prunedResult", {})
            polys = None
            if pruned.get("dt_polys"):
                polys = pruned["dt_polys"]
            elif pruned.get("rec_polys"):
                polys = pruned["rec_polys"]
            elif pruned.get("rec_boxes"):
                polys = [[[x1, y1], [x2, y1], [x2, y2], [x1, y2]]
                         for (x1, y1, x2, y2) in pruned["rec_boxes"]]
            for poly in polys or []:
                flat = [float(c) for point in poly for c in point]
                regions.append({"bbox": flat, "text": "",
                                "confidence": 1.0})
        return regions


# interface-compat alias (paddle_ocr.py:311)
PaddleOCRDetector = PaddleOCRProcessor
