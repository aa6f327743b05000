"""ctypes bindings for the native maskops library (native/maskops.cpp).

Host-side connected-components with cv2-identical stats, auto-building the
shared library on first use (g++ via native/Makefile) and falling back to
cv2 if the toolchain or library is unavailable. The device path lives in
ops/components.py; this is the native runtime for host tooling
(SURVEY.md: "native components ... implemented TPU-native ... else C++").
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmaskops.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # noqa: BLE001
            logger.warning("native maskops build failed (%s); using cv2 "
                           "fallback", e)
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.warning("cannot load %s: %s", _LIB_PATH, e)
        _build_failed = True
        return None
    i32 = ctypes.c_int32
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.maskops_label.argtypes = [u8p, i32, i32, i32, i32p, i32p, i32]
    lib.maskops_label.restype = i32
    lib.maskops_filter_area.argtypes = [u8p, i32, i32, i32, i32]
    lib.maskops_filter_area.restype = i32
    lib.maskops_keep_largest.argtypes = [u8p, i32, i32, i32, i32, i32]
    lib.maskops_keep_largest.restype = i32
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def connected_components_with_stats(mask: np.ndarray,
                                    connectivity: int = 8
                                    ) -> Tuple[int, np.ndarray, np.ndarray]:
    """cv2.connectedComponentsWithStats-compatible (num, labels, stats);
    stats columns = [LEFT, TOP, WIDTH, HEIGHT, AREA]."""
    m = np.ascontiguousarray((mask > 0).astype(np.uint8))
    h, w = m.shape
    lib = _load()
    if lib is None:
        import cv2
        num, labels, stats, _ = cv2.connectedComponentsWithStats(
            m, connectivity=connectivity)
        return num, labels, stats
    labels = np.zeros((h, w), np.int32)
    max_labels = h * w // 2 + 2
    stats = np.zeros((max_labels, 5), np.int32)
    num = lib.maskops_label(m, h, w, connectivity,
                            labels.reshape(-1), stats.reshape(-1),
                            max_labels)
    if num < 0:
        raise RuntimeError("maskops_label: too many components")
    return int(num), labels, stats[:num]


def filter_components_by_area(mask: np.ndarray, min_area: int,
                              connectivity: int = 8) -> np.ndarray:
    """Keep components with area > min_area; returns uint8 {0,255}."""
    m = np.ascontiguousarray((mask > 0).astype(np.uint8) * 255)
    lib = _load()
    if lib is None:
        import cv2
        num, labels, stats, _ = cv2.connectedComponentsWithStats(
            (m > 0).astype(np.uint8), connectivity=connectivity)
        out = np.zeros_like(m)
        for i in range(1, num):
            if stats[i, cv2.CC_STAT_AREA] > min_area:
                out[labels == i] = 255
        return out
    lib.maskops_filter_area(m, m.shape[0], m.shape[1], connectivity,
                            min_area)
    return m


def keep_largest_component(mask: np.ndarray, min_keep_area: int = 500,
                           fallback_min_area: int = 200,
                           connectivity: int = 8) -> np.ndarray:
    """The predict.py:251-266 rule, natively; returns uint8 {0,255}."""
    m = np.ascontiguousarray((mask > 0).astype(np.uint8) * 255)
    lib = _load()
    if lib is None:
        import cv2
        num, labels, stats, _ = cv2.connectedComponentsWithStats(
            (m > 0).astype(np.uint8), connectivity=connectivity)
        if num <= 1:
            return m
        largest = 1 + int(np.argmax(stats[1:, cv2.CC_STAT_AREA]))
        if stats[largest, cv2.CC_STAT_AREA] >= min_keep_area:
            return ((labels == largest) * 255).astype(np.uint8)
        out = np.zeros_like(m)
        for i in range(1, num):
            if stats[i, cv2.CC_STAT_AREA] > fallback_min_area:
                out[labels == i] = 255
        return out
    lib.maskops_keep_largest(m, m.shape[0], m.shape[1], connectivity,
                             min_keep_area, fallback_min_area)
    return m
