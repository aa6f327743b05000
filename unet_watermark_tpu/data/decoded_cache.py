"""Pre-decoded uint8 sample cache (disk memmap).

The reference hides decode cost behind torch DataLoader worker PROCESSES
(/root/reference/src/train.py:240-260, optimized_dataloader.py:127-310).
On a host with few cores that trick is void: JPEG decode + resize + mask
generation run on the same core that drives the device, and real epochs
become host-bound (round-2: 3-7.7 img/s end-to-end vs ~21 img/s device
step). The TPU-shaped fix is to pay decode ONCE: every sample is stored
decoded + resized as raw uint8 in two flat memmap files; after the first
epoch an access is a page-cached memcpy (~100 µs) instead of a decode
(~10-100 ms). 1,000 512² samples = ~1 GB — cheap against a TPU host's
RAM/disk.

Cache layout (one directory per dataset fingerprint):
    images.npy   (N, S, S, 3) uint8, np.lib.format memmap
    masks.npy    (N, S, S)    uint8
    present.npy  (N,)         uint8   1 = slot filled
    meta.json    fingerprint details (for debugging)

The fingerprint covers the ordered file list, sizes/mtimes, img_size and
mask parameters, so a changed dataset gets a fresh cache directory.
Population is lazy per index — a Subset that never touches half the
dataset never decodes it.

Not used in blurred-mask train mode: that path injects fresh Gaussian
noise per access (dataset.py analog of train-noise, reference
dataset.py:282-296) and caching would freeze it.
"""
from __future__ import annotations

import hashlib
import json
import logging
import os
import threading
from typing import Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _fingerprint(dataset) -> str:
    h = hashlib.sha1()
    h.update(str(dataset.img_size).encode())
    h.update(str(getattr(dataset, "generate_mask_threshold", "")).encode())
    h.update(str(getattr(dataset, "use_blurred_mask", False)).encode())
    for p in dataset.image_files:
        try:
            st = os.stat(p)
            h.update(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode())
        except OSError:
            h.update(f"{p}:gone".encode())
    return h.hexdigest()[:16]


class DecodedCache:
    """Wraps a WatermarkDataset-like object (needs .image_files,
    .img_size, __len__, __getitem__ returning (img u8 HWC, mask u8 HW))
    with a lazy disk memmap of decoded samples."""

    def __init__(self, dataset, cache_root: str):
        self.dataset = dataset
        self.img_size = dataset.img_size
        n, s = len(dataset), dataset.img_size
        tag = _fingerprint(dataset)
        self.dir = os.path.join(cache_root, f"decoded_{s}_{tag}")
        os.makedirs(self.dir, exist_ok=True)
        self._lock = threading.Lock()
        self.images = self._open("images.npy", (n, s, s, 3))
        self.masks = self._open("masks.npy", (n, s, s))
        self.present = self._open("present.npy", (n,))
        meta = os.path.join(self.dir, "meta.json")
        if not os.path.exists(meta):
            with open(meta, "w") as f:
                json.dump({"n": n, "img_size": s, "fingerprint": tag,
                           "first_file": dataset.image_files[0] if n else
                           None}, f)
        logger.info("decoded cache at %s: %d/%d present", self.dir,
                    int(self.present.sum()), n)

    def _open(self, name: str, shape) -> np.memmap:
        path = os.path.join(self.dir, name)
        mode = "r+" if os.path.exists(path) else "w+"
        return np.lib.format.open_memmap(
            path, mode=mode, dtype=np.uint8, shape=shape)

    # pass-throughs so DecodedCache can stand in for the dataset
    @property
    def image_files(self):
        return self.dataset.image_files

    def __len__(self) -> int:
        return len(self.dataset)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if self.present[idx]:
            return np.asarray(self.images[idx]), np.asarray(self.masks[idx])
        img, mask = self.dataset[idx]
        if mask.dtype != np.uint8:
            mask = np.clip(mask, 0, 255).astype(np.uint8)
        # np slice assignment releases the GIL mid-copy but each index's
        # slot is written by exactly one producer in practice; the present
        # flag is set only after both arrays are written.
        self.images[idx] = img
        self.masks[idx] = mask
        self.present[idx] = 1
        return img, mask

    def warm(self, indices=None, log_every: int = 200) -> None:
        """Eagerly decode (a subset of) the dataset into the cache."""
        indices = range(len(self)) if indices is None else indices
        for i, idx in enumerate(indices):
            self[idx]
            if log_every and (i + 1) % log_every == 0:
                logger.info("decoded cache warm: %d done", i + 1)


def maybe_wrap_decoded_cache(dataset, cfg, use_blurred_mask: bool):
    """Apply the decoded cache per config. Off when blurred-mask train
    noise would be frozen, or when DATA.CACHE_DECODED is false."""
    if not getattr(cfg.DATA, "CACHE_DECODED", True):
        return dataset
    if use_blurred_mask and dataset.mode == "train":
        logger.info("decoded cache disabled: blurred-mask train noise "
                    "must stay fresh per access")
        return dataset
    root = getattr(cfg.DATA, "CACHE_DIR", None) or os.path.join(
        cfg.DATA.ROOT_DIR, ".decoded_cache")
    try:
        return DecodedCache(dataset, root)
    except Exception as e:  # noqa: BLE001 — unwritable cache dir etc.
        logger.warning("decoded cache unavailable (%s); decoding per "
                       "epoch", e)
        return dataset
