"""Procedural clean-image synthesis (zero-egress data source).

The reference pipeline assumes a user-supplied folder of clean photos to
composite watermarks onto (/root/reference/src/scripts/gen_data.py:23-56)
and downloads pretrained inpainting weights at runtime
(/root/reference/src/predict.py:771). A zero-egress TPU pod can do
neither, so this module synthesizes natural-statistics images in-process:
fractal value noise, smooth color gradients, and anti-aliased geometric
content — enough structure (edges, textures, smooth regions) to train the
self-supervised FFC inpainting model and to drive auto-train demos.

CLI:
    python -m unet_watermark_tpu.data.synth_clean --output data/clean \
        --count 512 --size 512
"""
from __future__ import annotations

import argparse
import os
from typing import Tuple

import numpy as np


def _value_noise(rng: np.random.Generator, size: int, cells: int) -> np.ndarray:
    """Single-octave smooth value noise (bicubic-ish upsampled grid)."""
    import cv2

    grid = rng.random((cells + 1, cells + 1), np.float32)
    return cv2.resize(grid, (size, size), interpolation=cv2.INTER_CUBIC)


def fractal_noise(rng: np.random.Generator, size: int,
                  octaves: int = 4, persistence: float = 0.55) -> np.ndarray:
    """Fractal (fBm) value noise in [0,1]."""
    out = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    for o in range(octaves):
        cells = min(size // 2, 2 ** (o + 2))
        out += amp * _value_noise(rng, size, cells)
        total += amp
        amp *= persistence
    out /= total
    lo, hi = out.min(), out.max()
    return (out - lo) / max(hi - lo, 1e-6)


def _random_palette(rng: np.random.Generator, n: int = 3) -> np.ndarray:
    """n colors that are plausibly related (same hue family or complements)."""
    base = rng.random(3)
    cols = [base]
    for _ in range(n - 1):
        cols.append(np.clip(base + rng.normal(0, 0.35, 3), 0, 1))
    return np.asarray(cols, np.float32)


def _gradient_layer(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth linear or radial color gradient, (size, size, 3) in [0,1]."""
    c0, c1 = _random_palette(rng, 2)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    if rng.random() < 0.5:
        ang = rng.random() * 2 * np.pi
        t = (np.cos(ang) * xx + np.sin(ang) * yy + 1) / 2
    else:
        cx, cy = rng.random(2)
        t = np.sqrt((xx - cx) ** 2 + (yy - cy) ** 2)
        t /= max(t.max(), 1e-6)
    return c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]


def _draw_shapes(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Anti-aliased geometric content: ellipses, polygons, thick lines."""
    import cv2

    size = img.shape[0]
    out = (img * 255).astype(np.uint8)
    for _ in range(rng.integers(2, 9)):
        color = tuple(int(c) for c in rng.integers(0, 256, 3))
        kind = rng.integers(0, 3)
        if kind == 0:
            center = tuple(int(v) for v in rng.integers(0, size, 2))
            axes = tuple(int(v) for v in rng.integers(size // 20, size // 3, 2))
            cv2.ellipse(out, center, axes, float(rng.integers(0, 180)),
                        0, 360, color, -1, cv2.LINE_AA)
        elif kind == 1:
            pts = rng.integers(0, size, (rng.integers(3, 7), 2))
            cv2.fillPoly(out, [pts.astype(np.int32)], color, cv2.LINE_AA)
        else:
            p0 = tuple(int(v) for v in rng.integers(0, size, 2))
            p1 = tuple(int(v) for v in rng.integers(0, size, 2))
            cv2.line(out, p0, p1, color,
                     int(rng.integers(1, size // 24)), cv2.LINE_AA)
    return out.astype(np.float32) / 255.0


def synth_clean_image(rng: np.random.Generator, size: int = 512) -> np.ndarray:
    """One procedural clean image, (size, size, 3) uint8 RGB."""
    import cv2

    style = rng.integers(0, 4)
    base = _gradient_layer(rng, size)
    if style != 1:  # textured background
        noise = fractal_noise(rng, size, octaves=int(rng.integers(3, 6)))
        cols = _random_palette(rng, 2)
        tex = cols[0][None, None] * (1 - noise[..., None]) + \
            cols[1][None, None] * noise[..., None]
        w = rng.uniform(0.25, 0.8)
        base = base * (1 - w) + tex * w
    if style >= 2:  # geometric content on top
        base = _draw_shapes(rng, base)
    if rng.random() < 0.4:  # soft depth-of-field blur
        k = 2 * int(rng.integers(1, 4)) + 1
        base = cv2.GaussianBlur(base, (k, k), 0)
    if rng.random() < 0.3:  # vignette
        yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size - 0.5
        v = 1 - np.clip((xx ** 2 + yy ** 2) * rng.uniform(0.4, 1.2), 0, 0.5)
        base = base * v[..., None]
    return (np.clip(base, 0, 1) * 255).astype(np.uint8)


def _grating_layer(rng: np.random.Generator, size: int) -> np.ndarray:
    """Oriented sinusoid grating with noise-distorted phase (wood grain /
    fabric / brushed-metal family), (size, size) in [0,1]."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    ang = rng.random() * np.pi
    freq = rng.uniform(12, 80)  # cycles across the image — high frequency
    coord = np.cos(ang) * xx + np.sin(ang) * yy
    distort = fractal_noise(rng, size, octaves=3) * rng.uniform(0.0, 0.15)
    wave = np.sin(2 * np.pi * freq * (coord + distort)
                  + rng.random() * 2 * np.pi)
    if rng.random() < 0.4:  # square-ish duty cycle (stripes)
        wave = np.tanh(wave * rng.uniform(2, 8))
    return (wave + 1) / 2


def _cellular_layer(rng: np.random.Generator, size: int) -> np.ndarray:
    """Tile/brick/checker pattern with per-cell value jitter."""
    cells = int(rng.integers(12, 48))
    vals = rng.random((cells, cells), np.float32)
    if rng.random() < 0.5:  # brick offset every other row
        vals[1::2] = np.roll(vals[1::2], 1, axis=1)
    import cv2

    return cv2.resize(vals, (size, size), interpolation=cv2.INTER_NEAREST)


def _fine_fbm_layer(rng: np.random.Generator, size: int) -> np.ndarray:
    """Full-spectrum fBm: octaves down to 2-4 px features — the
    high-frequency statistics the smooth tier's capped octaves lack."""
    out = np.zeros((size, size), np.float32)
    amp, total = 1.0, 0.0
    octaves = int(np.log2(size)) - 1  # cells up to size/2
    persistence = rng.uniform(0.55, 0.75)
    for o in range(octaves):
        cells = min(size // 2, 2 ** (o + 2))
        out += amp * _value_noise(rng, size, cells)
        total += amp
        amp *= persistence
    out /= total
    lo, hi = out.min(), out.max()
    return (out - lo) / max(hi - lo, 1e-6)


def synth_textured_image(rng: np.random.Generator,
                         size: int = 512) -> np.ndarray:
    """One procedural clean image with NATURAL-IMAGE high-frequency
    statistics, (size, size, 3) uint8 RGB.

    The smooth tier (synth_clean_image) caps its noise octaves low
    enough that boundary interpolation (push-pull) is a near-ideal
    inpainter on it, which inverts the engine ranking vs real photos
    (docs/QUALITY.md round 3). This tier layers fine-grain fBm,
    oriented gratings, cellular tiles, and per-pixel speckle so a hole
    can only be filled well by synthesizing texture — the regime the
    reference's pretrained LaMa targets (its masked-photo corpus,
    /root/reference/src/scripts/gen_data.py:23-56)."""
    import cv2

    base = _gradient_layer(rng, size)
    # 1-3 strong high-frequency layers, each colorized with its palette
    for _ in range(int(rng.integers(1, 4))):
        kind = rng.integers(0, 3)
        if kind == 0:
            tex = _fine_fbm_layer(rng, size)
        elif kind == 1:
            tex = _grating_layer(rng, size)
        else:
            tex = _cellular_layer(rng, size)
        cols = _random_palette(rng, 2)
        layer = cols[0][None, None] * (1 - tex[..., None]) + \
            cols[1][None, None] * tex[..., None]
        w = rng.uniform(0.35, 0.75)
        base = base * (1 - w) + layer * w
    if rng.random() < 0.5:  # geometric content on top
        base = _draw_shapes(rng, base)
    # per-pixel speckle grain — survives JPEG at quality 95
    grain = rng.normal(0, rng.uniform(0.01, 0.05), (size, size, 1))
    base = base + grain.astype(np.float32)
    if rng.random() < 0.2:  # mild blur on a minority only
        base = cv2.GaussianBlur(base, (3, 3), 0)
    return (np.clip(base, 0, 1) * 255).astype(np.uint8)


def generate_clean_dataset(output_dir: str, count: int = 256,
                           size: int = 512, seed: int = 0,
                           quality: int = 95,
                           texture_ratio: float = 0.0) -> int:
    """Write `count` procedural clean JPGs; resumable (skips existing).

    texture_ratio: fraction of images drawn from the textured tier
    (synth_textured_image). 0.0 (default) reproduces the historical
    smooth-tier corpus byte-identically for a given seed; the per-image
    rng stream is independent of the ratio, so raising it only switches
    which generator consumes each image's stream.
    """
    import cv2

    os.makedirs(output_dir, exist_ok=True)
    written = 0
    for i in range(count):
        path = os.path.join(output_dir, f"synth_{i:05d}.jpg")
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(seed * 1_000_003 + i)
        if texture_ratio > 0 and (i % max(1, round(1 / texture_ratio))) == 0:
            img = synth_textured_image(rng, size)
        else:
            img = synth_clean_image(rng, size)
        cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, quality])
        written += 1
    return written


def synth_logo(rng: np.random.Generator, size: int = 256) -> np.ndarray:
    """One procedural RGBA logo: geometric emblem + optional text strip.
    Feeds gen_data.load_watermarks the way user logo assets do
    (/root/reference/src/scripts/gen_data.py:23-56)."""
    from PIL import Image, ImageDraw, ImageFont

    img = Image.new("RGBA", (size, size), (0, 0, 0, 0))
    dr = ImageDraw.Draw(img)
    color = tuple(int(c) for c in rng.integers(40, 256, 3)) + (
        int(rng.integers(140, 256)),)
    kind = rng.integers(0, 4)
    m = size // 5
    if kind == 0:    # ring
        w = int(rng.integers(size // 16, size // 6))
        dr.ellipse([m, m, size - m, size - m], outline=color, width=w)
    elif kind == 1:  # solid polygon
        n_pts = int(rng.integers(3, 8))
        ang0 = rng.random() * 2 * np.pi
        pts = [(size / 2 + (size / 2 - m) * np.cos(ang0 + 2 * np.pi * i / n_pts),
                size / 2 + (size / 2 - m) * np.sin(ang0 + 2 * np.pi * i / n_pts))
               for i in range(n_pts)]
        dr.polygon(pts, fill=color)
    elif kind == 2:  # crossed bars
        w = int(rng.integers(size // 12, size // 5))
        dr.rectangle([m, size // 2 - w // 2, size - m, size // 2 + w // 2],
                     fill=color)
        dr.rectangle([size // 2 - w // 2, m, size // 2 + w // 2, size - m],
                     fill=color)
    else:            # letters
        try:
            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans-Bold.ttf",
                size // 2)
        except OSError:
            font = ImageFont.load_default()
        text = "".join(chr(int(rng.integers(65, 91)))
                       for _ in range(int(rng.integers(2, 4))))
        dr.text((size // 6, size // 4), text, fill=color, font=font)
    if rng.random() < 0.5:  # text strip under the emblem
        try:
            font = ImageFont.truetype(
                "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", size // 8)
            word = "".join(chr(int(rng.integers(97, 123)))
                           for _ in range(int(rng.integers(4, 9))))
            dr.text((size // 6, size - size // 6), word, fill=color,
                    font=font)
        except OSError:
            pass
    return np.asarray(img)


def generate_logo_set(output_dir: str, count: int = 24,
                      size: int = 256, seed: int = 0) -> int:
    from PIL import Image

    os.makedirs(output_dir, exist_ok=True)
    written = 0
    for i in range(count):
        path = os.path.join(output_dir, f"logo_{i:03d}.png")
        if os.path.exists(path):
            continue
        rng = np.random.default_rng(seed * 7_000_003 + i)
        Image.fromarray(synth_logo(rng, size)).save(path)
        written += 1
    return written


def main(argv=None):
    p = argparse.ArgumentParser(description="synthesize clean images/logos")
    p.add_argument("--output", required=True)
    p.add_argument("--count", type=int, default=256)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--logos", action="store_true",
                   help="generate RGBA logo assets instead of clean images")
    p.add_argument("--texture-ratio", type=float, default=0.0,
                   help="fraction of images from the high-frequency "
                        "textured tier (0 = historical smooth corpus)")
    args = p.parse_args(argv)
    if args.logos:
        n = generate_logo_set(args.output, args.count, args.size, args.seed)
    else:
        n = generate_clean_dataset(args.output, args.count, args.size,
                                   args.seed,
                                   texture_ratio=args.texture_ratio)
    print(f"wrote {n} images to {args.output}")


if __name__ == "__main__":
    main()
