"""Synthetic watermark training-data generator.

Reimplements the behavior of /root/reference/src/scripts/gen_data.py:
composite logo / text / mixed / multiple watermarks onto clean images with
randomized rotation (0-360°), anisotropic scaling, alpha (transparent
0.08-0.45 / opaque 0.25-0.85 for logos; 0.1-0.5 / 0.3-0.8 for text,
gen_data.py:198-240,461-573), blur and partial-erasure defects, and emit
(watermarked image, binary mask) pairs with resume-aware bulk CLI.

Host-side by design: this is offline data *generation* (PIL/numpy), not the
training hot path. The training pipeline consumes its outputs through
data/dataset.py. Every randomized decision funnels through one
random.Random instance so runs are reproducible per seed.
"""
from __future__ import annotations

import argparse
import logging
import os
import random
import string
from typing import List, Optional, Sequence, Tuple

import numpy as np
from PIL import Image, ImageDraw, ImageFilter, ImageFont

logger = logging.getLogger(__name__)

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp", ".webp")

# Text pools mirroring generate_text_content (gen_data.py:170-196)
_WORDS = ["SAMPLE", "WATERMARK", "COPYRIGHT", "DEMO", "PREVIEW", "DRAFT",
          "CONFIDENTIAL", "PROTECTED", "ORIGINAL", "AUTHENTIC"]
_SITES = ["www.example.com", "photo.site.net", "images.demo.org",
          "stock.sample.io"]


def load_watermarks(logos_dir: str) -> List[str]:
    """List RGBA watermark assets (gen_data.py:23-48)."""
    if not os.path.isdir(logos_dir):
        return []
    return sorted(
        os.path.join(logos_dir, f) for f in os.listdir(logos_dir)
        if f.lower().endswith(IMAGE_EXTENSIONS))


def load_clean_images(clean_dir: str) -> List[str]:
    if not os.path.isdir(clean_dir):
        return []
    return sorted(
        os.path.join(clean_dir, f) for f in os.listdir(clean_dir)
        if f.lower().endswith(IMAGE_EXTENSIONS))


def load_system_fonts() -> List[str]:
    """Discover usable TTF fonts (gen_data.py:58-106)."""
    candidates = []
    for root in ("/usr/share/fonts", "/usr/local/share/fonts",
                 os.path.expanduser("~/.fonts")):
        for dirpath, _, files in os.walk(root):
            for f in files:
                if f.lower().endswith((".ttf", ".ttc", ".otf")):
                    candidates.append(os.path.join(dirpath, f))
    return sorted(candidates)


def generate_text_content(rng: Optional[random.Random] = None) -> str:
    """Random watermark-ish text (gen_data.py:170-196)."""
    rng = rng or random
    kind = rng.random()
    if kind < 0.4:
        return rng.choice(_WORDS)
    if kind < 0.6:
        return rng.choice(_SITES)
    if kind < 0.8:
        return "© " + "".join(rng.choices(string.ascii_uppercase, k=rng.randint(3, 8)))
    return (rng.choice(_WORDS) + " " +
            "".join(rng.choices(string.digits, k=4)))


def _render_text(text: str, fonts: Sequence[str],
                 rng: random.Random) -> Image.Image:
    """Render text to a tight RGBA image."""
    size = rng.randint(28, 96)
    font = None
    for fp in rng.sample(list(fonts), k=min(3, len(fonts))) if fonts else []:
        try:
            font = ImageFont.truetype(fp, size)
            break
        except Exception:  # noqa: BLE001
            continue
    if font is None:
        font = ImageFont.load_default()
    color = rng.choice([(255, 255, 255), (0, 0, 0), (200, 200, 200),
                        (255, 0, 0), (0, 80, 200), (240, 240, 120)])
    tmp = Image.new("RGBA", (4, 4))
    bbox = ImageDraw.Draw(tmp).textbbox((0, 0), text, font=font)
    w = max(bbox[2] - bbox[0], 1)
    h = max(bbox[3] - bbox[1], 1)
    img = Image.new("RGBA", (w + 8, h + 8), (0, 0, 0, 0))
    ImageDraw.Draw(img).text((4 - bbox[0], 4 - bbox[1]), text, font=font,
                             fill=color + (255,))
    return img


def apply_text_effects(text_img: Image.Image, enhance_transparent: bool = True,
                       rng: Optional[random.Random] = None) -> Image.Image:
    """Rotation, anisotropic scale, alpha (gen_data.py:198-242)."""
    rng = rng or random
    angle = rng.uniform(0, 360)
    text_img = text_img.rotate(angle, expand=True, fillcolor=(0, 0, 0, 0))
    sx, sy = rng.uniform(0.8, 1.4), rng.uniform(0.8, 1.4)
    text_img = text_img.resize(
        (max(int(text_img.width * sx), 1), max(int(text_img.height * sy), 1)),
        Image.LANCZOS)
    alpha = (rng.uniform(0.1, 0.5) if enhance_transparent
             else rng.uniform(0.3, 0.8))
    arr = np.array(text_img)
    arr[:, :, 3] = (arr[:, :, 3].astype(np.float32) * alpha).astype(np.uint8)
    return Image.fromarray(arr)


def apply_watermark_effects(watermark: Image.Image,
                            enhance_transparent: bool = True,
                            target_size: Optional[Tuple[int, int]] = None,
                            rng: Optional[random.Random] = None
                            ) -> Image.Image:
    """Logo effects: scale to 3-35% of target, rotation 0-360°, optional
    blur / partial erasure defects, alpha (gen_data.py:461-573)."""
    rng = rng or random
    watermark = watermark.convert("RGBA")
    if target_size is not None:
        scale = rng.uniform(0.03, 0.35)
        new_w = max(int(target_size[0] * scale), 8)
        new_h = max(int(watermark.height * new_w / max(watermark.width, 1)), 8)
        new_h = min(new_h, max(int(target_size[1] * 0.35), 8))
        watermark = watermark.resize((new_w, new_h), Image.LANCZOS)
    angle = rng.uniform(0, 360)
    watermark = watermark.rotate(angle, expand=True, fillcolor=(0, 0, 0, 0))
    if rng.random() < 0.3:
        watermark = watermark.filter(
            ImageFilter.GaussianBlur(rng.uniform(0.5, 1.5)))
    if rng.random() < 0.2:  # partial-erasure defect
        arr = np.array(watermark)
        h, w = arr.shape[:2]
        for _ in range(rng.randint(1, 3)):
            if h < 4 or w < 4:
                break
            eh, ew = rng.randint(h // 8 + 1, h // 3 + 1), rng.randint(
                w // 8 + 1, w // 3 + 1)
            ey, ex = rng.randint(0, h - eh), rng.randint(0, w - ew)
            arr[ey:ey + eh, ex:ex + ew, 3] = 0
        watermark = Image.fromarray(arr)
    alpha = (rng.uniform(0.08, 0.45) if enhance_transparent
             else rng.uniform(0.25, 0.85))
    arr = np.array(watermark)
    arr[:, :, 3] = (arr[:, :, 3].astype(np.float32) * alpha).astype(np.uint8)
    return Image.fromarray(arr)


def _paste_and_mask(clean: Image.Image, wm: Image.Image,
                    pos: Tuple[int, int],
                    mask: np.ndarray,
                    alpha_threshold: int = 10) -> None:
    """Alpha-composite wm onto clean at pos; OR its footprint into mask."""
    clean.alpha_composite(wm, dest=pos)
    a = np.array(wm)[:, :, 3]
    ys, xs = pos[1], pos[0]
    h, w = a.shape
    H, W = mask.shape
    y2, x2 = min(ys + h, H), min(xs + w, W)
    if y2 <= ys or x2 <= xs:
        return
    region = a[: y2 - ys, : x2 - xs] > alpha_threshold
    mask[ys:y2, xs:x2] |= region


def _random_pos(rng: random.Random, canvas: Tuple[int, int],
                wm: Tuple[int, int]) -> Tuple[int, int]:
    x = rng.randint(0, max(canvas[0] - wm[0], 0))
    y = rng.randint(0, max(canvas[1] - wm[1], 0))
    return x, y


def _ocr_refine_text_mask(watermarked: Image.Image,
                          geo_mask: np.ndarray) -> np.ndarray:
    """OCR-refined text mask (ref gen_data.py:352-366): run a text
    detector over the COMPOSITED image and use its box fills as the mask,
    so training labels reflect what a detector sees rather than the raw
    alpha footprint. Two deliberate deviations from the reference:
      * the zero-egress builtin detector (ocr/builtin.py) stands in for
        EasyOCR;
      * the OCR mask is intersected with the dilated geometric footprint
        — the reference trusts OCR output verbatim, which lets false
        positives on background content corrupt labels.
    Falls back to the geometric mask when OCR recovers too little of the
    footprint (the reference's exception fallback, gen_data.py:366).

    geo_mask: bool (H, W). Returns bool (H, W).
    """
    import cv2

    from ..ocr.builtin import BuiltinTextDetector

    ocr_mask = BuiltinTextDetector().generate_text_mask(watermarked)
    if ocr_mask is None:
        return geo_mask
    footprint = cv2.dilate(geo_mask.astype(np.uint8),
                           np.ones((9, 9), np.uint8)) > 0
    refined = (ocr_mask > 0) & footprint
    # OCR must recover a meaningful share of the real footprint, else the
    # label would silently drop the watermark
    if refined.sum() < 0.2 * max(int(geo_mask.sum()), 1):
        return geo_mask
    return refined


def generate_text_watermark(clean_image_path: str,
                            enhance_transparent: bool = True,
                            fonts: Optional[Sequence[str]] = None,
                            rng: Optional[random.Random] = None,
                            use_ocr_mask: bool = False
                            ) -> Tuple[Image.Image, np.ndarray]:
    """Text watermark + mask (gen_data.py:244-378). use_ocr_mask enables
    the reference's OCR-refined mask pass (gen_data.py:352-366); off by
    default so historical corpora stay byte-identical per seed."""
    rng = rng or random.Random()
    fonts = fonts if fonts is not None else load_system_fonts()
    clean = Image.open(clean_image_path).convert("RGBA")
    out_mask = np.zeros((clean.height, clean.width), bool)
    for _ in range(rng.randint(1, 3)):
        text = generate_text_content(rng)
        timg = _render_text(text, fonts, rng)
        timg = apply_text_effects(timg, enhance_transparent, rng)
        # clamp oversize text to 80% of the canvas (gen_data.py:318-341)
        if timg.width > clean.width * 0.8 or timg.height > clean.height * 0.8:
            s = min(clean.width * 0.8 / timg.width,
                    clean.height * 0.8 / timg.height)
            timg = timg.resize((max(int(timg.width * s), 1),
                                max(int(timg.height * s), 1)), Image.LANCZOS)
        pos = _random_pos(rng, (clean.width, clean.height),
                          (timg.width, timg.height))
        _paste_and_mask(clean, timg, pos, out_mask)
    rgb = clean.convert("RGB")
    if use_ocr_mask:
        out_mask = _ocr_refine_text_mask(rgb, out_mask)
    return rgb, out_mask.astype(np.uint8) * 255


def generate_watermarked_image(clean_image_path: str, watermark_path: str,
                               enhance_transparent: bool = True,
                               rng: Optional[random.Random] = None
                               ) -> Tuple[Image.Image, np.ndarray]:
    """Single logo watermark + mask (gen_data.py:690-712)."""
    rng = rng or random.Random()
    clean = Image.open(clean_image_path).convert("RGBA")
    wm = Image.open(watermark_path).convert("RGBA")
    wm = apply_watermark_effects(wm, enhance_transparent,
                                 (clean.width, clean.height), rng)
    out_mask = np.zeros((clean.height, clean.width), bool)
    pos = _random_pos(rng, (clean.width, clean.height), (wm.width, wm.height))
    _paste_and_mask(clean, wm, pos, out_mask)
    return clean.convert("RGB"), out_mask.astype(np.uint8) * 255


def calculate_overlap_area(rect1, rect2) -> int:
    """Rect intersection area (gen_data.py:679-688); rects are
    (x, y, w, h)."""
    x1 = max(rect1[0], rect2[0])
    y1 = max(rect1[1], rect2[1])
    x2 = min(rect1[0] + rect1[2], rect2[0] + rect2[2])
    y2 = min(rect1[1] + rect1[3], rect2[1] + rect2[3])
    return max(0, x2 - x1) * max(0, y2 - y1)


def generate_multiple_watermarks_image(
        clean_image_path: str, watermark_paths: Sequence[str],
        enhance_transparent: bool = True, max_watermarks: int = 3,
        rng: Optional[random.Random] = None
        ) -> Tuple[Image.Image, np.ndarray]:
    """Several non-heavily-overlapping logos (gen_data.py:576-677)."""
    rng = rng or random.Random()
    clean = Image.open(clean_image_path).convert("RGBA")
    out_mask = np.zeros((clean.height, clean.width), bool)
    placed: List[Tuple[int, int, int, int]] = []
    count = rng.randint(2, max(max_watermarks, 2))
    for _ in range(count):
        wm = Image.open(rng.choice(list(watermark_paths))).convert("RGBA")
        wm = apply_watermark_effects(wm, enhance_transparent,
                                     (clean.width, clean.height), rng)
        for _attempt in range(10):
            pos = _random_pos(rng, (clean.width, clean.height),
                              (wm.width, wm.height))
            rect = (pos[0], pos[1], wm.width, wm.height)
            area = wm.width * wm.height
            overlap = sum(calculate_overlap_area(rect, p) for p in placed)
            if area == 0 or overlap / area < 0.3:
                placed.append(rect)
                _paste_and_mask(clean, wm, pos, out_mask)
                break
    return clean.convert("RGB"), out_mask.astype(np.uint8) * 255


def generate_mixed_watermark(clean_image_path: str,
                             watermark_paths: Sequence[str],
                             enhance_transparent: bool = True,
                             max_watermarks: int = 2,
                             fonts: Optional[Sequence[str]] = None,
                             rng: Optional[random.Random] = None
                             ) -> Tuple[Image.Image, np.ndarray]:
    """Logos + text on one image (gen_data.py:380-443)."""
    rng = rng or random.Random()
    fonts = fonts if fonts is not None else load_system_fonts()
    img, mask = generate_multiple_watermarks_image(
        clean_image_path, watermark_paths, enhance_transparent,
        max_watermarks, rng)
    clean = img.convert("RGBA")
    out_mask = mask > 127
    text = generate_text_content(rng)
    timg = apply_text_effects(_render_text(text, fonts, rng),
                              enhance_transparent, rng)
    if timg.width > clean.width * 0.8 or timg.height > clean.height * 0.8:
        s = min(clean.width * 0.8 / timg.width,
                clean.height * 0.8 / timg.height)
        timg = timg.resize((max(int(timg.width * s), 1),
                            max(int(timg.height * s), 1)), Image.LANCZOS)
    pos = _random_pos(rng, (clean.width, clean.height),
                      (timg.width, timg.height))
    out_mask_b = out_mask.copy()
    _paste_and_mask(clean, timg, pos, out_mask_b)
    return clean.convert("RGB"), out_mask_b.astype(np.uint8) * 255


def generate_filename(clean_path: str, kind: str, index: int) -> str:
    stem = os.path.splitext(os.path.basename(clean_path))[0]
    return f"{stem}_{kind}_{index:05d}.jpg"


def generate_dataset(clean_dir: str, output_root: str,
                     logos_dir: Optional[str] = None,
                     count: int = 100,
                     ratios: Optional[dict] = None,
                     enhance_transparent: bool = True,
                     seed: int = 42,
                     resume: bool = True,
                     use_ocr_mask: bool = False) -> dict:
    """Bulk generation with resume — analog of gen_data.py main (:713-967).

    ratios: {"logo": w, "text": w, "mixed": w, "multi": w} sampling weights.
    Writes ROOT/{watermarked,clean,masks}; 'clean' holds the source copy so
    dataset.py's absdiff path also works on generated data.
    """
    ratios = ratios or {"logo": 0.4, "text": 0.3, "mixed": 0.15,
                        "multi": 0.15}
    cleans = load_clean_images(clean_dir)
    if not cleans:
        raise FileNotFoundError(f"no clean images in {clean_dir}")
    logos = load_watermarks(logos_dir) if logos_dir else []
    fonts = load_system_fonts()
    wm_dir = os.path.join(output_root, "watermarked")
    cl_dir = os.path.join(output_root, "clean")
    mk_dir = os.path.join(output_root, "masks")
    for d in (wm_dir, cl_dir, mk_dir):
        os.makedirs(d, exist_ok=True)

    kinds = list(ratios)
    weights = [ratios[k] for k in kinds]
    stats = {k: 0 for k in kinds}
    stats["skipped"] = 0
    from tqdm import tqdm
    for i in tqdm(range(count), desc="generating", unit="img"):
        # per-index child RNG: skipping an existing output consumes no
        # draws, so resumed runs regenerate byte-identical filenames/content
        rng = random.Random(f"{seed}:{i}")
        clean_path = rng.choice(cleans)
        kind = rng.choices(kinds, weights)[0]
        if kind in ("logo", "mixed", "multi") and not logos:
            kind = "text"
        name = generate_filename(clean_path, kind, i)
        out_img = os.path.join(wm_dir, name)
        if resume and os.path.exists(out_img):
            stats["skipped"] += 1
            continue
        try:
            if kind == "text":
                img, mask = generate_text_watermark(
                    clean_path, enhance_transparent, fonts, rng,
                    use_ocr_mask=use_ocr_mask)
            elif kind == "logo":
                img, mask = generate_watermarked_image(
                    clean_path, rng.choice(logos), enhance_transparent, rng)
            elif kind == "multi":
                img, mask = generate_multiple_watermarks_image(
                    clean_path, logos, enhance_transparent, rng=rng)
            else:
                img, mask = generate_mixed_watermark(
                    clean_path, logos, enhance_transparent, fonts=fonts,
                    rng=rng)
        except Exception as e:  # noqa: BLE001
            logger.warning("generation failed for %s: %s", clean_path, e)
            continue
        img.save(out_img, quality=95)
        Image.open(clean_path).convert("RGB").save(
            os.path.join(cl_dir, name), quality=95)
        Image.fromarray(mask).save(
            os.path.join(mk_dir, os.path.splitext(name)[0] + ".png"))
        stats[kind] = stats.get(kind, 0) + 1
    return stats


def main(argv=None):
    p = argparse.ArgumentParser(description="synthetic watermark data gen")
    p.add_argument("--clean-dir", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--logos-dir", default=None)
    p.add_argument("--count", type=int, default=100)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--opaque", action="store_true",
                   help="use opaque (non-transparent) watermarks")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument("--ocr-mask", action="store_true",
                   help="OCR-refined text masks (ref gen_data.py:352-366)")
    args = p.parse_args(argv)
    stats = generate_dataset(
        args.clean_dir, args.output, args.logos_dir, args.count,
        enhance_transparent=not args.opaque, seed=args.seed,
        resume=not args.no_resume, use_ocr_mask=args.ocr_mask)
    print(stats)


if __name__ == "__main__":
    main()
