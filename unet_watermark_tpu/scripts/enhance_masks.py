"""Mask enhancement — analog of /root/reference/src/scripts/enhance_masks.py.

enhance_mask (:16-67): dilate + Gaussian blur + edge-smoothing to widen
thin masks before inpainting; yolo_to_mask (:69+): YOLO txt label → binary
mask rasterization. The enhancement chain runs on device via the parity
ops (batchable); YOLO conversion is host-side file tooling."""
from __future__ import annotations

import argparse
import logging
import os
from typing import Optional, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)


def enhance_mask(mask: np.ndarray, dilate_size: int = 5,
                 dilate_iterations: int = 2, blur_size: int = 5,
                 blur_sigma: float = 2.0,
                 rethreshold: float = 0.25) -> np.ndarray:
    """Dilate → blur → re-threshold (enhance_masks.py:16-67 semantics) as
    one jitted device graph."""
    import jax.numpy as jnp

    from ..ops import morphology as m

    x = jnp.asarray((mask > 127).astype(np.float32))
    x = m.dilate(x, m.ellipse_kernel(dilate_size, dilate_size),
                 dilate_iterations)
    x = m.gaussian_blur(x, (blur_size | 1, blur_size | 1), blur_sigma)
    x = m.threshold_binary(x, rethreshold)
    return (np.asarray(x) * 255).astype(np.uint8)


def yolo_to_mask(label_path: str, image_shape: Tuple[int, int],
                 class_filter: Optional[int] = None) -> np.ndarray:
    """YOLO txt (class cx cy w h, normalized) → filled-box binary mask
    (enhance_masks.py:69 analog)."""
    h, w = image_shape
    mask = np.zeros((h, w), np.uint8)
    if not os.path.exists(label_path):
        return mask
    with open(label_path) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 5:
                continue
            cls, cx, cy, bw, bh = (float(v) for v in parts[:5])
            if class_filter is not None and int(cls) != class_filter:
                continue
            x1 = int((cx - bw / 2) * w)
            y1 = int((cy - bh / 2) * h)
            x2 = int((cx + bw / 2) * w)
            y2 = int((cy + bh / 2) * h)
            cv2.rectangle(mask, (max(x1, 0), max(y1, 0)),
                          (min(x2, w - 1), min(y2, h - 1)), 255, -1)
    return mask


def enhance_folder(input_dir: str, output_dir: str, **kwargs) -> int:
    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for f in sorted(os.listdir(input_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")):
            continue
        mask = cv2.imread(os.path.join(input_dir, f), cv2.IMREAD_GRAYSCALE)
        if mask is None:
            continue
        out = enhance_mask(mask, **kwargs)
        cv2.imwrite(os.path.join(output_dir, f), out)
        count += 1
    logger.info("enhanced %d masks", count)
    return count


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="mask enhancement")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--dilate-size", type=int, default=5)
    p.add_argument("--iterations", type=int, default=2)
    args = p.parse_args(argv)
    enhance_folder(args.input, args.output, dilate_size=args.dilate_size,
                   dilate_iterations=args.iterations)


if __name__ == "__main__":
    main()
