"""Dataset: file discovery, mask load-or-generate, seeded splits.

Host-side analog of /root/reference/src/utils/dataset.py with the same
directory contract (ROOT/{watermarked,clean,masks}, multi-root support,
dataset.py:397-417), the same mask rules, and the same seeded 80/20 split
(:439-480). The division of labor is TPU-first:

  host  — decode (cv2), resize to the static IMG_SIZE, mask
          load-or-generate with on-disk caching (absdiff → threshold →
          morphology, dataset.py:197-296)
  device — all augmentation + normalization (ops/augment.py), fused into
          the train step

So each sample crosses host→HBM exactly once per epoch, as uint8.
"""
from __future__ import annotations

import logging
import os
import random
from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

logger = logging.getLogger(__name__)

IMAGE_EXTENSIONS = {".jpg", ".jpeg", ".png", ".bmp", ".tiff", ".tif"}


def _safe_imread(path: str, flags: int = cv2.IMREAD_COLOR):
    """Tolerant read (corrupted-image skip, dataset.py:94-99,137-156)."""
    try:
        data = np.fromfile(path, dtype=np.uint8)
        img = cv2.imdecode(data, flags)
        return img
    except Exception as e:  # noqa: BLE001
        logger.warning("failed to read %s: %s", path, e)
        return None


class WatermarkDataset:
    """Index-addressable dataset of (image uint8 HWC RGB, mask uint8 HW).

    Mirrors WatermarkDataset (dataset.py:19-296): multi-dir collection,
    mask priority = explicit mask file > clean/watermarked absdiff
    generation (cached to mask_dirs[0]) > zero mask; corrupted images skip
    to the next index; optional in-memory cache; blurred-mask mode with
    convex-hull connectivity and soft Gaussian edges.
    """

    def __init__(self, watermarked_dirs, clean_dirs=None, mask_dirs=None,
                 img_size: int = 512, mode: str = "train",
                 generate_mask_threshold: int = 30,
                 cache_images: bool = False,
                 use_blurred_mask: bool = False):
        as_list = lambda d: (d if isinstance(d, (list, tuple))
                             else [d] if d else [])
        self.watermarked_dirs = as_list(watermarked_dirs)
        self.clean_dirs = as_list(clean_dirs)
        self.mask_dirs = as_list(mask_dirs)
        self.img_size = img_size
        self.mode = mode
        self.generate_mask_threshold = generate_mask_threshold
        self.cache_images = cache_images
        self.use_blurred_mask = use_blurred_mask
        self._cache = {} if cache_images else None
        self.image_files = self._collect_image_files()

    def _collect_image_files(self) -> List[str]:
        files = []
        for d in self.watermarked_dirs:
            if os.path.isdir(d):
                for fn in os.listdir(d):
                    if os.path.splitext(fn)[1].lower() in IMAGE_EXTENSIONS:
                        files.append(os.path.join(d, fn))
        logger.info("found %d images", len(files))
        return sorted(files)

    def __len__(self) -> int:
        return len(self.image_files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self._cache is not None and idx in self._cache:
            return self._cache[idx]
        for attempt in range(len(self.image_files)):
            j = (idx + attempt) % len(self.image_files)
            sample = self._load(j)
            if sample is not None:
                if self._cache is not None:
                    self._cache[idx] = sample
                return sample
        raise RuntimeError("no readable images in dataset")

    def _load(self, idx: int):
        path = self.image_files[idx]
        img = _safe_imread(path)
        if img is None:
            logger.warning("skipping corrupted image: %s", path)
            return None
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        mask = self._get_or_generate_mask(os.path.basename(path), img)
        s = self.img_size
        if img.shape[:2] != (s, s):
            img = cv2.resize(img, (s, s), interpolation=cv2.INTER_LINEAR)
        if mask.shape[:2] != (s, s):
            mask = cv2.resize(mask, (s, s), interpolation=cv2.INTER_NEAREST)
        return img, mask

    # ---- mask rules (dataset.py:158-296) ---------------------------------
    def _get_or_generate_mask(self, image_name: str,
                              watermarked_img: np.ndarray) -> np.ndarray:
        stem = os.path.splitext(image_name)[0]
        for m_dir in self.mask_dirs:
            p = os.path.join(m_dir, stem + ".png")
            if os.path.exists(p):
                mask = _safe_imread(p, cv2.IMREAD_GRAYSCALE)
                if mask is not None:
                    return mask
        for c_dir in self.clean_dirs:
            p = os.path.join(c_dir, image_name)
            if os.path.exists(p):
                clean = _safe_imread(p)
                if clean is None:
                    continue
                clean = cv2.cvtColor(clean, cv2.COLOR_BGR2RGB)
                mask = self.generate_mask(watermarked_img, clean)
                if self.mask_dirs:
                    os.makedirs(self.mask_dirs[0], exist_ok=True)
                    out = os.path.join(self.mask_dirs[0], stem + ".png")
                    try:
                        cv2.imwrite(out, mask)
                    except Exception as e:  # noqa: BLE001
                        logger.warning("mask cache write failed %s: %s",
                                       out, e)
                return mask
        return np.zeros(watermarked_img.shape[:2], np.uint8)

    def generate_mask(self, watermarked: np.ndarray,
                      clean: np.ndarray) -> np.ndarray:
        """absdiff → threshold → open(3x3); then exact or blurred finishing
        (dataset.py:197-280)."""
        if watermarked.shape != clean.shape:
            clean = cv2.resize(clean, (watermarked.shape[1],
                                       watermarked.shape[0]))
        diff = cv2.absdiff(watermarked, clean)
        gray = cv2.cvtColor(diff, cv2.COLOR_RGB2GRAY)
        _, mask = cv2.threshold(gray, self.generate_mask_threshold, 255,
                                cv2.THRESH_BINARY)
        k3 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
        mask = cv2.morphologyEx(mask, cv2.MORPH_OPEN, k3, iterations=1)
        if self.use_blurred_mask:
            return self._blurred_mask(mask)
        # exact mask: light smoothing only
        mask = cv2.GaussianBlur(mask, (3, 3), 0.5)
        _, mask = cv2.threshold(mask, 127, 255, cv2.THRESH_BINARY)
        return mask

    def _blurred_mask(self, mask: np.ndarray) -> np.ndarray:
        """Blurred-mask mode: heavy closing, largest-component rule,
        convex-hull connectivity, soft Gaussian edges + train noise
        (dataset.py:215-296)."""
        k7 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (7, 7))
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k7, iterations=3)
        k11 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (11, 11))
        mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, k11, iterations=2)
        k9 = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (9, 9))
        mask = cv2.dilate(mask, k9, iterations=2)

        n, labels, stats, _ = cv2.connectedComponentsWithStats(
            mask, connectivity=8)
        if n > 1:
            largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
            max_area = stats[largest, cv2.CC_STAT_AREA]
            if max_area >= 500:
                mask = (labels == largest).astype(np.uint8) * 255
            else:
                keep = np.zeros_like(labels, np.uint8)
                for i in range(1, n):
                    if stats[i, cv2.CC_STAT_AREA] > 200:
                        keep[labels == i] = 255
                mask = keep

        contours, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                       cv2.CHAIN_APPROX_SIMPLE)
        if contours:
            connected = np.zeros_like(mask)
            for contour in contours:
                area = cv2.contourArea(contour)
                if area <= 100:
                    continue
                hull = cv2.convexHull(contour)
                hull_area = cv2.contourArea(hull)
                if hull_area > 0 and area / hull_area > 0.6:
                    cv2.fillPoly(connected, [hull], 255)
                else:
                    eps = 0.015 * cv2.arcLength(contour, True)
                    approx = cv2.approxPolyDP(contour, eps, True)
                    cv2.fillPoly(connected, [approx], 255)
            mask = connected

        # soft edges
        mask = cv2.GaussianBlur(mask, (15, 15), 5.0)
        mask = cv2.GaussianBlur(mask, (31, 31), 10.0)
        if self.mode == "train":
            noise = np.random.normal(0, 5, mask.shape).astype(np.float32)
            mask = np.clip(mask.astype(np.float32) + noise, 0,
                           255).astype(np.uint8)
        return mask


class Subset:
    def __init__(self, dataset: WatermarkDataset, indices: Sequence[int]):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self) -> int:
        return len(self.indices)

    def __getitem__(self, i: int):
        return self.dataset[self.indices[i]]


def dataset_dirs_from_config(cfg):
    roots = [cfg.DATA.ROOT_DIR] + list(cfg.DATA.ADDITIONAL_ROOT_DIRS)
    watermarked = [os.path.join(r, "watermarked") for r in roots]
    clean = [os.path.join(r, "clean") for r in roots]
    masks = [os.path.join(r, "masks") for r in roots]
    return watermarked, clean, masks


def create_datasets(cfg, use_blurred_mask: bool = False
                    ) -> Tuple[Subset, Subset]:
    """Seeded TRAIN_RATIO split — analog of dataset.py:397-480.

    The device-side augmentation policy (cfg.DATA.AUGMENTATION_TYPE) is
    applied by the training loop, not here; both subsets share one host
    dataset object (and its cache).
    """
    watermarked, clean, masks = dataset_dirs_from_config(cfg)
    full = WatermarkDataset(
        watermarked_dirs=watermarked, clean_dirs=clean, mask_dirs=masks,
        img_size=cfg.DATA.IMG_SIZE, mode="train",
        generate_mask_threshold=cfg.DATA.GENERATE_MASK_THRESHOLD,
        cache_images=cfg.DATA.CACHE_IMAGES,
        use_blurred_mask=use_blurred_mask)
    n = len(full)
    indices = list(range(n))
    if cfg.DATA.SHUFFLE:
        random.Random(cfg.DATA.SEED).shuffle(indices)
    train_size = int(cfg.DATA.TRAIN_RATIO * n)
    train_idx, val_idx = indices[:train_size], indices[train_size:]
    val = WatermarkDataset(
        watermarked_dirs=watermarked, clean_dirs=clean, mask_dirs=masks,
        img_size=cfg.DATA.IMG_SIZE, mode="val",
        generate_mask_threshold=cfg.DATA.GENERATE_MASK_THRESHOLD,
        cache_images=cfg.DATA.CACHE_IMAGES,
        use_blurred_mask=use_blurred_mask)
    logger.info("dataset split: %d train / %d val", len(train_idx),
                len(val_idx))
    from .decoded_cache import maybe_wrap_decoded_cache
    full = maybe_wrap_decoded_cache(full, cfg, use_blurred_mask)
    val = maybe_wrap_decoded_cache(val, cfg, use_blurred_mask)
    return Subset(full, train_idx), Subset(val, val_idx)
