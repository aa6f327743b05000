"""Native maskops (C++ union-find CC) vs cv2 golden tests."""
import cv2
import numpy as np
import pytest

from unet_watermark_tpu.utils import native


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.native_available(), "native maskops failed to build"


def _labels_to_sets(labels):
    out = {}
    h, w = labels.shape
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if l > 0:
                out.setdefault(l, set()).add((y, x))
    return {frozenset(v) for v in out.values()}


@pytest.mark.parametrize("connectivity", [4, 8])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_labels_and_stats_match_cv2(seed, connectivity):
    rng = np.random.default_rng(seed)
    mask = (rng.random((64, 80)) < 0.35).astype(np.uint8) * 255
    n_ref, l_ref, s_ref, _ = cv2.connectedComponentsWithStats(
        (mask > 0).astype(np.uint8), connectivity=connectivity)
    n, labels, stats = native.connected_components_with_stats(
        mask, connectivity=connectivity)
    assert n == n_ref
    assert _labels_to_sets(labels) == _labels_to_sets(l_ref)
    # stats match up to label permutation: compare as sorted rowsets
    ref_rows = sorted(map(tuple, s_ref[1:, :5].tolist()))
    our_rows = sorted(map(tuple, stats[1:, :5].tolist()))
    assert ref_rows == our_rows


def test_filter_area_matches_cv2(rng):
    mask = np.zeros((64, 64), np.uint8)
    mask[0:10, 0:10] = 255   # 100
    mask[20:25, 20:25] = 255  # 25
    mask[40:63, 40:63] = 255  # 529
    out = native.filter_components_by_area(mask, min_area=50)
    assert out[5, 5] == 255 and out[50, 50] == 255
    assert out[22, 22] == 0


def test_keep_largest_rule():
    mask = np.zeros((64, 64), np.uint8)
    mask[2:30, 2:30] = 255
    mask[40:45, 40:45] = 255
    out = native.keep_largest_component(mask)
    assert out[10, 10] == 255 and out[42, 42] == 0
    # all-small fallback
    mask2 = np.zeros((64, 64), np.uint8)
    mask2[0:15, 0:15] = 255    # 225 > 200 but < 500
    mask2[30:40, 30:40] = 255  # 100 < 200
    out2 = native.keep_largest_component(mask2)
    assert out2[5, 5] == 255 and out2[35, 35] == 0


def test_empty_and_full():
    empty = np.zeros((32, 32), np.uint8)
    n, labels, stats = native.connected_components_with_stats(empty)
    assert n == 1 and (labels == 0).all()
    full = np.full((32, 32), 255, np.uint8)
    n, labels, stats = native.connected_components_with_stats(full)
    assert n == 2 and (labels[labels > 0] == 1).all()
    assert stats[1, 4] == 32 * 32


def test_native_faster_than_python_loop():
    """Sanity: native labeling handles a large mask quickly."""
    import time

    rng = np.random.default_rng(0)
    mask = (rng.random((1024, 1024)) < 0.4).astype(np.uint8) * 255
    t0 = time.time()
    n, labels, stats = native.connected_components_with_stats(mask)
    dt = time.time() - t0
    assert dt < 1.0, dt
    assert n > 1
