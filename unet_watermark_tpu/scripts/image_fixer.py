"""Corrupted-image detection & repair — analog of
/root/reference/src/scripts/image_fixer.py (:26-238).

Detects unreadable/truncated images and repairs them by re-encoding
(PIL first, cv2 fallback), optionally backing up the originals."""
from __future__ import annotations

import argparse
import logging
import os
import shutil
from typing import Dict, List, Optional

import cv2
import numpy as np
from PIL import Image

logger = logging.getLogger(__name__)

IMAGE_EXTS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif", ".webp"}


class ImageFixer:
    def __init__(self, backup_dir: Optional[str] = None):
        self.backup_dir = backup_dir

    @staticmethod
    def check_image(path: str) -> Optional[str]:
        """Returns a problem string or None if healthy."""
        try:
            with Image.open(path) as img:
                img.verify()
        except Exception as e:  # noqa: BLE001
            return f"pil_verify: {e}"
        try:
            with Image.open(path) as img:
                img.load()
        except Exception as e:  # noqa: BLE001
            return f"pil_load: {e}"
        if cv2.imread(path) is None:
            return "cv2_unreadable"
        return None

    def fix_image(self, path: str) -> bool:
        """Re-encode in place; backs up the original first if configured."""
        if self.backup_dir:
            os.makedirs(self.backup_dir, exist_ok=True)
            try:
                shutil.copy2(path, os.path.join(self.backup_dir,
                                                os.path.basename(path)))
            except Exception as e:  # noqa: BLE001
                logger.warning("backup failed for %s: %s", path, e)
        try:
            with Image.open(path) as img:
                img = img.convert("RGB")
                img.save(path, quality=95)
            return cv2.imread(path) is not None
        except Exception:  # noqa: BLE001
            img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
            if img is None:
                return False
            return bool(cv2.imwrite(path, img))

    def scan_folder(self, folder: str, fix: bool = False) -> Dict:
        checked = 0
        problems: List[Dict] = []
        for f in sorted(os.listdir(folder)):
            if os.path.splitext(f)[1].lower() not in IMAGE_EXTS:
                continue
            path = os.path.join(folder, f)
            checked += 1
            problem = self.check_image(path)
            if problem:
                fixed = self.fix_image(path) if fix else False
                problems.append({"path": path, "problem": problem,
                                 "fixed": fixed})
        summary = {
            "checked": checked,
            "corrupted": len(problems),
            "fixed": sum(1 for p in problems if p["fixed"]),
            "details": problems,
        }
        logger.info("image check: %d checked, %d corrupted, %d fixed",
                    checked, len(problems), summary["fixed"])
        return summary


def main(argv=None):
    from ..utils.jaxtools import enable_compile_cache
    enable_compile_cache()
    p = argparse.ArgumentParser(description="corrupted image fixer")
    p.add_argument("--folder", required=True)
    p.add_argument("--fix", action="store_true")
    p.add_argument("--backup-dir", default=None)
    args = p.parse_args(argv)
    fixer = ImageFixer(backup_dir=args.backup_dir)
    s = fixer.scan_folder(args.folder, fix=args.fix)
    print({k: v for k, v in s.items() if k != "details"})


if __name__ == "__main__":
    main()
