"""Comparison-video generation — analog of
/root/reference/src/scripts/video_generator.py.

Same products: switch-style, side-by-side, and three-way (original /
mask-heatmap / repaired) comparison MP4s with letterboxed aspect-preserving
frames and text overlays (video_generator.py:263,384,516). Uses
cv2.VideoWriter directly (moviepy is not in this image; it was only a
frame-sequence writer in the reference anyway). Host-side tooling by
design — this is the human-in-the-loop acceptance channel (SURVEY.md §4.4),
not a compute path.
"""
from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".webp"}


def _clean_stem(name: str) -> str:
    """Match repaired outputs to originals by cleaned stem
    (video_generator.py:62-160): strips _mask/_repaired suffixes."""
    stem = os.path.splitext(os.path.basename(name))[0]
    for suffix in ("_mask", "_repaired", "_text_mask", "_fixed"):
        if stem.endswith(suffix):
            stem = stem[: -len(suffix)]
    return stem


def _list_images(folder: str) -> Dict[str, str]:
    out = {}
    if not os.path.isdir(folder):
        return out
    for f in sorted(os.listdir(folder)):
        if os.path.splitext(f)[1].lower() in IMAGE_EXTS:
            out[_clean_stem(f)] = os.path.join(folder, f)
    return out


class VideoGenerator:
    """video_generator.py:26-776 analog."""

    def __init__(self, width: int = 1920, height: int = 1080,
                 duration_per_image: float = 2.0, fps: int = 30):
        self.width = width
        self.height = height
        self.duration = duration_per_image
        self.fps = fps

    # ---- matching (video_generator.py:62-160) -----------------------------
    def find_image_pairs(self, original_dir: str, repaired_dir: str
                         ) -> List[Tuple[str, str]]:
        orig = _list_images(original_dir)
        rep = _list_images(repaired_dir)
        return [(orig[k], rep[k]) for k in sorted(orig) if k in rep]

    def find_image_triplets(self, original_dir: str, repaired_dir: str,
                            mask_dir: str
                            ) -> List[Tuple[str, str, str]]:
        orig = _list_images(original_dir)
        rep = _list_images(repaired_dir)
        msk = _list_images(mask_dir)
        return [(orig[k], rep[k], msk[k]) for k in sorted(orig)
                if k in rep and k in msk]

    # ---- frame helpers (video_generator.py:162-260) -----------------------
    def resize_image_with_padding(self, image: np.ndarray,
                                  target_w: Optional[int] = None,
                                  target_h: Optional[int] = None
                                  ) -> np.ndarray:
        tw = target_w or self.width
        th = target_h or self.height
        h, w = image.shape[:2]
        scale = min(tw / w, th / h)
        nw, nh = int(w * scale), int(h * scale)
        resized = cv2.resize(image, (nw, nh))
        canvas = np.zeros((th, tw, 3), np.uint8)
        y0, x0 = (th - nh) // 2, (tw - nw) // 2
        canvas[y0:y0 + nh, x0:x0 + nw] = resized
        return canvas

    def add_text_overlay(self, image: np.ndarray, text: str,
                         position: str = "top") -> np.ndarray:
        out = image.copy()
        font = cv2.FONT_HERSHEY_SIMPLEX
        scale = max(out.shape[1] / 1920.0, 0.5) * 1.2
        thickness = max(int(2 * scale), 1)
        (tw, th), _ = cv2.getTextSize(text, font, scale, thickness)
        x = (out.shape[1] - tw) // 2
        y = th + 20 if position == "top" else out.shape[0] - 20
        cv2.rectangle(out, (x - 10, y - th - 10), (x + tw + 10, y + 10),
                      (0, 0, 0), -1)
        cv2.putText(out, text, (x, y), font, scale, (255, 255, 255),
                    thickness, cv2.LINE_AA)
        return out

    def _writer(self, output_path: str) -> cv2.VideoWriter:
        os.makedirs(os.path.dirname(os.path.abspath(output_path)),
                    exist_ok=True)
        w = cv2.VideoWriter(output_path,
                            cv2.VideoWriter_fourcc(*"mp4v"),
                            self.fps, (self.width, self.height))
        if not w.isOpened():
            raise RuntimeError(f"cannot open video writer: {output_path}")
        return w

    def _hold(self, writer: cv2.VideoWriter, frame: np.ndarray,
              seconds: Optional[float] = None) -> None:
        for _ in range(int((seconds or self.duration) * self.fps)):
            writer.write(frame)

    # ---- video products ---------------------------------------------------
    def create_comparison_video(self, original_dir: str, repaired_dir: str,
                                output_path: str) -> Optional[str]:
        """Switch-style: original then repaired per image
        (video_generator.py:263-382)."""
        pairs = self.find_image_pairs(original_dir, repaired_dir)
        if not pairs:
            logger.warning("no image pairs found")
            return None
        writer = self._writer(output_path)
        try:
            for op, rp in pairs:
                o = cv2.imread(op)
                r = cv2.imread(rp)
                if o is None or r is None:
                    continue
                of = self.add_text_overlay(
                    self.resize_image_with_padding(o), "Original")
                rf = self.add_text_overlay(
                    self.resize_image_with_padding(r), "Repaired")
                self._hold(writer, of)
                self._hold(writer, rf)
        finally:
            writer.release()
        logger.info("comparison video: %s (%d pairs)", output_path,
                    len(pairs))
        return output_path

    def create_side_by_side_video(self, original_dir: str,
                                  repaired_dir: str,
                                  output_path: str) -> Optional[str]:
        """video_generator.py:384-514."""
        pairs = self.find_image_pairs(original_dir, repaired_dir)
        if not pairs:
            logger.warning("no image pairs found")
            return None
        half_w = self.width // 2
        writer = self._writer(output_path)
        try:
            for op, rp in pairs:
                o = cv2.imread(op)
                r = cv2.imread(rp)
                if o is None or r is None:
                    continue
                of = self.add_text_overlay(self.resize_image_with_padding(
                    o, half_w, self.height), "Original")
                rf = self.add_text_overlay(self.resize_image_with_padding(
                    r, self.width - half_w, self.height), "Repaired")
                frame = np.concatenate([of, rf], axis=1)
                self._hold(writer, frame)
        finally:
            writer.release()
        logger.info("side-by-side video: %s (%d pairs)", output_path,
                    len(pairs))
        return output_path

    def create_three_way_comparison_video(self, original_dir: str,
                                          repaired_dir: str, mask_dir: str,
                                          output_path: str
                                          ) -> Optional[str]:
        """Original | mask heatmap (COLORMAP_HOT, :567) | repaired."""
        triplets = self.find_image_triplets(original_dir, repaired_dir,
                                            mask_dir)
        if not triplets:
            logger.warning("no image triplets found")
            return None
        third = self.width // 3
        writer = self._writer(output_path)
        try:
            for op, rp, mp in triplets:
                o = cv2.imread(op)
                r = cv2.imread(rp)
                mk = cv2.imread(mp, cv2.IMREAD_GRAYSCALE)
                if o is None or r is None or mk is None:
                    continue
                heat = cv2.applyColorMap(mk, cv2.COLORMAP_HOT)
                of = self.add_text_overlay(self.resize_image_with_padding(
                    o, third, self.height), "Original")
                mf = self.add_text_overlay(self.resize_image_with_padding(
                    heat, third, self.height), "Mask")
                rf = self.add_text_overlay(self.resize_image_with_padding(
                    r, self.width - 2 * third, self.height), "Repaired")
                frame = np.concatenate([of, mf, rf], axis=1)
                self._hold(writer, frame)
        finally:
            writer.release()
        logger.info("three-way video: %s (%d triplets)", output_path,
                    len(triplets))
        return output_path
