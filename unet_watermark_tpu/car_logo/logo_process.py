"""Logo preprocessing — analog of
/root/reference/src/car_logo/logo_process.py (:6-127).

White-background removal → RGBA with soft alpha, then resize to 256²
preserving aspect (padded)."""
from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)


def remove_background_and_resize(image_path: str,
                                 output_path: Optional[str] = None,
                                 size: int = 256,
                                 white_threshold: int = 240
                                 ) -> Image.Image:
    img = Image.open(image_path).convert("RGBA")
    arr = np.array(img)
    rgb = arr[..., :3].astype(np.int32)
    # near-white pixels become transparent; soft edge near the threshold
    brightness = rgb.min(axis=-1)
    alpha = np.where(brightness >= white_threshold, 0,
                     np.where(brightness >= white_threshold - 20,
                              (white_threshold - brightness) * 255 // 20,
                              255)).astype(np.uint8)
    arr[..., 3] = np.minimum(arr[..., 3], alpha)
    out = Image.fromarray(arr)

    # crop to content bbox, then letterbox into size x size
    mask = arr[..., 3] > 10
    if mask.any():
        ys, xs = np.where(mask)
        out = out.crop((xs.min(), ys.min(), xs.max() + 1, ys.max() + 1))
    scale = min(size / out.width, size / out.height)
    nw, nh = max(int(out.width * scale), 1), max(int(out.height * scale), 1)
    out = out.resize((nw, nh), Image.LANCZOS)
    canvas = Image.new("RGBA", (size, size), (0, 0, 0, 0))
    canvas.paste(out, ((size - nw) // 2, (size - nh) // 2), out)
    if output_path:
        canvas.save(output_path)
    return canvas


def process_folder(input_dir: str, output_dir: str, size: int = 256) -> int:
    os.makedirs(output_dir, exist_ok=True)
    count = 0
    for f in sorted(os.listdir(input_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg", ".webp")):
            continue
        stem = os.path.splitext(f)[0]
        try:
            remove_background_and_resize(
                os.path.join(input_dir, f),
                os.path.join(output_dir, f"{stem}.png"), size)
            count += 1
        except Exception as e:  # noqa: BLE001
            logger.warning("failed on %s: %s", f, e)
    return count


def main(argv=None):
    p = argparse.ArgumentParser(description="logo background removal")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--size", type=int, default=256)
    args = p.parse_args(argv)
    print(process_folder(args.input, args.output, args.size))


if __name__ == "__main__":
    main()
