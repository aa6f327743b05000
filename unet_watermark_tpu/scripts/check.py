"""Dataset validator — analog of /root/reference/src/scripts/check.py.

Cross-checks the ROOT/{watermarked,clean,masks} triads, detects all-black
masks (<1% nonzero, check.py:20-45) and missing/orphaned files, with
detect / delete / move modes (:61-326)."""
from __future__ import annotations

import argparse
import logging
import os
import shutil
from typing import Dict, List

import cv2
import numpy as np

logger = logging.getLogger(__name__)

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif", ".webp"}


def is_black_mask(mask_path: str, threshold: float = 0.01) -> bool:
    """check.py:20-45: a mask with under 1% nonzero pixels is 'black'."""
    mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    if mask is None:
        return True
    return (mask > 0).mean() < threshold


def _stems(folder: str) -> Dict[str, str]:
    out = {}
    if not os.path.isdir(folder):
        return out
    for f in sorted(os.listdir(folder)):
        stem, ext = os.path.splitext(f)
        if ext.lower() in IMAGE_EXTS:
            out[stem] = os.path.join(folder, f)
    return out


def _mask_component_count(mask_path: str):
    """Connected-component count via the native C++ runtime
    (native/maskops.cpp through utils/native.py; cv2 fallback inside).
    Used to flag fragmented masks — a failure mode black-mask detection
    misses (noise masks with hundreds of specks train badly)."""
    mask = cv2.imread(mask_path, cv2.IMREAD_GRAYSCALE)
    if mask is None:
        return None
    from ..utils import native

    num, _labels, _stats = native.connected_components_with_stats(mask, 8)
    return max(int(num) - 1, 0)  # minus background


def validate_dataset(root: str, mode: str = "detect",
                     quarantine_dir: str = None,
                     black_threshold: float = 0.01,
                     fragment_limit: int = 64) -> Dict:
    """check.py:61-326 analog. mode: detect | delete | move."""
    wm = _stems(os.path.join(root, "watermarked"))
    cl = _stems(os.path.join(root, "clean"))
    mk = _stems(os.path.join(root, "masks"))

    problems: Dict[str, List[str]] = {
        "missing_clean": [], "missing_mask": [], "black_mask": [],
        "fragmented_mask": [],
        "orphan_clean": [], "orphan_mask": [], "corrupted": []}
    component_counts: List[int] = []

    for stem, path in wm.items():
        img = cv2.imread(path)
        if img is None:
            problems["corrupted"].append(path)
            continue
        if cl and stem not in cl:
            problems["missing_clean"].append(path)
        if stem not in mk:
            problems["missing_mask"].append(path)
        elif is_black_mask(mk[stem], black_threshold):
            problems["black_mask"].append(mk[stem])
        else:
            n_comp = _mask_component_count(mk[stem])
            if n_comp is not None:
                component_counts.append(n_comp)
                if n_comp > fragment_limit:
                    problems["fragmented_mask"].append(mk[stem])
    for stem, path in cl.items():
        if stem not in wm:
            problems["orphan_clean"].append(path)
    for stem, path in mk.items():
        if stem not in wm:
            problems["orphan_mask"].append(path)

    affected = set()
    for key in ("black_mask", "corrupted", "missing_mask"):
        for p in problems[key]:
            affected.add(os.path.splitext(os.path.basename(p))[0]
                         .removesuffix("_mask"))

    removed = []
    if mode in ("delete", "move"):
        if mode == "move":
            quarantine_dir = quarantine_dir or os.path.join(root,
                                                            "quarantine")
            os.makedirs(quarantine_dir, exist_ok=True)
        for stem in affected:
            for d in (wm, cl, mk):
                if stem in d and os.path.exists(d[stem]):
                    if mode == "delete":
                        os.remove(d[stem])
                    else:
                        shutil.move(d[stem], os.path.join(
                            quarantine_dir, os.path.basename(d[stem])))
                    removed.append(d[stem])

    summary = {
        "total_watermarked": len(wm),
        "total_clean": len(cl),
        "total_masks": len(mk),
        "problems": {k: len(v) for k, v in problems.items()},
        "problem_files": problems,
        "affected_triads": len(affected),
        "handled": removed,
        "mode": mode,
        "mask_stats": {
            "analyzed": len(component_counts),
            "avg_components": (sum(component_counts) / len(component_counts))
            if component_counts else 0.0,
            "max_components": max(component_counts, default=0),
            "fragment_limit": fragment_limit,
        },
    }
    logger.info("validate: %d watermarked, problems=%s", len(wm),
                summary["problems"])
    return summary


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="dataset triad validator")
    p.add_argument("--root", required=True)
    p.add_argument("--mode", choices=["detect", "delete", "move"],
                   default="detect")
    p.add_argument("--quarantine", default=None)
    args = p.parse_args(argv)
    s = validate_dataset(args.root, args.mode, args.quarantine)
    print({k: v for k, v in s.items() if k != "problem_files"})


if __name__ == "__main__":
    main()
