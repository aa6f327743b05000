"""Device connected-components vs cv2.connectedComponentsWithStats."""
import cv2
import numpy as np
import pytest

from unet_watermark_tpu.ops import components as cc


def _labels_to_sets(labels):
    """Partition of foreground pixels → set of frozensets (label-invariant)."""
    out = {}
    h, w = labels.shape
    for y in range(h):
        for x in range(w):
            l = labels[y, x]
            if l > 0:
                out.setdefault(l, set()).add((y, x))
    return {frozenset(v) for v in out.values()}


@pytest.mark.parametrize("connectivity", [4, 8])
def test_labeling_matches_cv2_partition(rng, connectivity):
    mask = (rng.random((48, 48)) < 0.35).astype(np.uint8) * 255
    _, ref = cv2.connectedComponents(mask, connectivity=connectivity)
    ours = np.asarray(cc.label_components(mask.astype(np.float32) / 255,
                                          connectivity=connectivity))
    assert _labels_to_sets(ref) == _labels_to_sets(ours)


def test_component_areas_match_cv2(rng):
    mask = (rng.random((48, 48)) < 0.3).astype(np.uint8) * 255
    n, ref_labels, stats, _ = cv2.connectedComponentsWithStats(
        mask, connectivity=8)
    area_map_ref = np.zeros_like(ref_labels)
    for i in range(1, n):
        area_map_ref[ref_labels == i] = stats[i, cv2.CC_STAT_AREA]
    labels = cc.label_components(mask.astype(np.float32) / 255)
    ours = np.asarray(cc.component_areas(labels))
    np.testing.assert_array_equal(ours, area_map_ref)


def test_keep_largest_component_rule(rng):
    """Replicates predict.py:251-266 semantics."""
    mask = np.zeros((64, 64), np.uint8)
    mask[2:30, 2:30] = 255      # large blob (784 px)
    mask[40:45, 40:45] = 255    # small blob (25 px)
    out = np.asarray(cc.keep_largest_component(mask.astype(np.float32) / 255))
    assert out[10, 10] == 1.0
    assert out[42, 42] == 0.0

    # all-small case → keep components with area > 200
    mask2 = np.zeros((64, 64), np.uint8)
    mask2[0:15, 0:15] = 255   # 225 px (>200, but <500)
    mask2[30:40, 30:40] = 255  # 100 px (<200)
    out2 = np.asarray(cc.keep_largest_component(
        mask2.astype(np.float32) / 255))
    assert out2[5, 5] == 1.0
    assert out2[35, 35] == 0.0


def test_filter_components_by_area():
    mask = np.zeros((32, 32), np.uint8)
    mask[0:10, 0:10] = 255   # 100 px
    mask[20:25, 20:25] = 255  # 25 px
    out = np.asarray(cc.filter_components_by_area(
        mask.astype(np.float32) / 255, min_area=50))
    assert out[5, 5] == 1.0 and out[22, 22] == 0.0


def test_count_components(rng):
    mask = (rng.random((40, 40)) < 0.25).astype(np.uint8) * 255
    n_ref, _ = cv2.connectedComponents(mask, connectivity=8)
    ours = int(cc.count_components(mask.astype(np.float32) / 255))
    assert ours == n_ref - 1  # cv2 counts background


def test_snake_worst_case():
    """A long winding 1px path must still resolve to one component."""
    mask = np.zeros((64, 64), np.float32)
    for i in range(0, 64, 2):
        mask[i, :] = 1
        if (i // 2) % 2 == 0:
            mask[i + 1, -1] = 1
        else:
            mask[i + 1, 0] = 1
    assert int(cc.count_components(mask)) == 1
