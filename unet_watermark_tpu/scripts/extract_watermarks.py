"""Watermark asset extraction — analog of
/root/reference/extract_watermarks.py.

clean/watermarked absdiff → contours → DBSCAN spatial clustering
(eps = 25% of image diagonal, extract_watermarks.py:104-120) → per-cluster
transparent RGBA watermark crops with contrast/sharpen enhancement (:200).
The extracted assets feed data/gen_data.py as compositing material."""
from __future__ import annotations

import argparse
import logging
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)


class WatermarkExtractor:
    def __init__(self, diff_threshold: int = 30, min_contour_area: int = 50,
                 eps_ratio: float = 0.25, min_samples: int = 1):
        self.diff_threshold = diff_threshold
        self.min_contour_area = min_contour_area
        self.eps_ratio = eps_ratio
        self.min_samples = min_samples

    def diff_mask(self, watermarked: np.ndarray,
                  clean: np.ndarray) -> np.ndarray:
        if watermarked.shape != clean.shape:
            clean = cv2.resize(clean, (watermarked.shape[1],
                                       watermarked.shape[0]))
        diff = cv2.absdiff(watermarked, clean)
        gray = cv2.cvtColor(diff, cv2.COLOR_BGR2GRAY)
        _, mask = cv2.threshold(gray, self.diff_threshold, 255,
                                cv2.THRESH_BINARY)
        k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        return cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k, iterations=2)

    def cluster_regions(self, mask: np.ndarray
                        ) -> List[Tuple[int, int, int, int]]:
        """Blob centroids clustered by DBSCAN
        (extract_watermarks.py:104-120); returns per-cluster bboxes.

        Blob discovery runs through the native C++ connected-components
        runtime (native/maskops.cpp via utils/native.py) — same outer
        regions as cv2.findContours(RETR_EXTERNAL) with pixel-exact area
        stats; cv2 remains the automatic fallback inside native.py."""
        from ..utils import native

        num, _labels, stats = native.connected_components_with_stats(mask, 8)
        centers = []
        boxes = []
        for x, y, w, h, area in stats[1:num]:  # row 0 = background
            if area < self.min_contour_area:
                continue
            centers.append([x + w / 2, y + h / 2])
            boxes.append((int(x), int(y), int(w), int(h)))
        if not centers:
            return []
        h_img, w_img = mask.shape
        eps = self.eps_ratio * float(np.hypot(h_img, w_img))
        try:
            from sklearn.cluster import DBSCAN
            labels = DBSCAN(eps=eps, min_samples=self.min_samples).fit(
                np.asarray(centers)).labels_
        except ImportError:
            labels = np.zeros(len(centers), int)  # single cluster fallback
        out = []
        for lbl in sorted(set(labels)):
            if lbl == -1:
                continue
            group = [boxes[i] for i in range(len(boxes)) if labels[i] == lbl]
            x1 = min(b[0] for b in group)
            y1 = min(b[1] for b in group)
            x2 = max(b[0] + b[2] for b in group)
            y2 = max(b[1] + b[3] for b in group)
            out.append((x1, y1, x2 - x1, y2 - y1))
        return out

    def enhance(self, rgba: np.ndarray) -> np.ndarray:
        """Contrast boost + sharpen (extract_watermarks.py:200 analog)."""
        rgb = rgba[..., :3].astype(np.float32)
        rgb = np.clip((rgb - 127.5) * 1.2 + 127.5, 0, 255)
        kernel = np.array([[0, -1, 0], [-1, 5, -1], [0, -1, 0]], np.float32)
        rgb = cv2.filter2D(rgb.astype(np.uint8), -1, kernel)
        out = rgba.copy()
        out[..., :3] = rgb
        return out

    def extract_from_pair(self, watermarked_path: str, clean_path: str
                          ) -> List[np.ndarray]:
        wm = cv2.imread(watermarked_path)
        cl = cv2.imread(clean_path)
        if wm is None or cl is None:
            return []
        mask = self.diff_mask(wm, cl)
        assets = []
        for (x, y, w, h) in self.cluster_regions(mask):
            pad = max(2, int(0.05 * max(w, h)))
            x1, y1 = max(x - pad, 0), max(y - pad, 0)
            x2 = min(x + w + pad, wm.shape[1])
            y2 = min(y + h + pad, wm.shape[0])
            crop = wm[y1:y2, x1:x2]
            alpha = mask[y1:y2, x1:x2]
            rgba = np.dstack([cv2.cvtColor(crop, cv2.COLOR_BGR2RGB), alpha])
            assets.append(self.enhance(rgba))
        return assets

    def batch_extract(self, watermarked_dir: str, clean_dir: str,
                      output_dir: str, limit: Optional[int] = None) -> Dict:
        os.makedirs(output_dir, exist_ok=True)
        files = sorted(f for f in os.listdir(watermarked_dir)
                       if f.lower().endswith((".jpg", ".jpeg", ".png")))
        if limit:
            files = files[:limit]
        count = 0
        pairs = 0
        for f in files:
            cp = os.path.join(clean_dir, f)
            if not os.path.exists(cp):
                continue
            pairs += 1
            assets = self.extract_from_pair(
                os.path.join(watermarked_dir, f), cp)
            stem = os.path.splitext(f)[0]
            for i, a in enumerate(assets):
                from PIL import Image
                Image.fromarray(a).save(
                    os.path.join(output_dir, f"{stem}_wm{i}.png"))
                count += 1
        logger.info("extracted %d watermark assets from %d pairs", count,
                    pairs)
        return {"pairs": pairs, "assets": count}


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="extract watermark assets")
    p.add_argument("--watermarked", required=True)
    p.add_argument("--clean", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--limit", type=int)
    args = p.parse_args(argv)
    ex = WatermarkExtractor()
    print(ex.batch_extract(args.watermarked, args.clean, args.output,
                           args.limit))


if __name__ == "__main__":
    main()
