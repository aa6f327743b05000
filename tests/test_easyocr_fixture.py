"""EasyOCR backend bodies driven by recorded reader outputs.

easyocr itself is not installable in this image, so the import gate in
ocr/easy_ocr.py was the only thing CI ever executed. These tests inject
a fake `easyocr` module whose Reader returns RECORDED readtext results
(the library's (4-point-bbox, text, confidence) tuples), so
detect_text_regions' normalization, generate_text_mask's polygon
rasterization, and batch_process' skip-done logic all run for real.
(Reference contract: /root/reference/src/ocr/easy_ocr.py:52-214.)
"""
import os
import sys
import types

import cv2
import numpy as np
import pytest

from unet_watermark_tpu.ocr.easy_ocr import EasyOCRDetector

# A recorded readtext() result set: one axis-aligned box, one skewed
# quad (easyocr returns arbitrary quadrilaterals), one malformed entry
# that normalization must drop.
RECORDED = [
    ([[10, 10], [60, 10], [60, 30], [10, 30]], "SAMPLE", 0.93),
    ([[5, 40], [90, 42], [89, 60], [4, 58]], "WMARK", 0.81),
    ([[0, 0], [1, 0]], "bad", 0.5),
]


class FakeReader:
    created = []

    def __init__(self, languages, gpu=False, verbose=False):
        self.languages = list(languages)
        FakeReader.created.append(self)

    def readtext(self, img):
        return list(RECORDED)


@pytest.fixture()
def fake_easyocr(monkeypatch):
    mod = types.ModuleType("easyocr")
    mod.Reader = FakeReader
    monkeypatch.setitem(sys.modules, "easyocr", mod)
    FakeReader.created = []
    return mod


@pytest.fixture()
def img_path(tmp_path):
    p = str(tmp_path / "img.png")
    cv2.imwrite(p, np.full((80, 100, 3), 200, np.uint8))
    return p


def test_detect_text_regions_normalizes(fake_easyocr, img_path):
    det = EasyOCRDetector(languages=["en"])
    regions = det.detect_text_regions(img_path)
    assert len(regions) == 2  # malformed bbox dropped
    r0 = regions[0]
    assert r0["bbox"] == [10.0, 10.0, 60.0, 10.0, 60.0, 30.0, 10.0, 30.0]
    assert r0["text"] == "SAMPLE"
    assert abs(r0["confidence"] - 0.93) < 1e-9


def test_generate_text_mask_rasterizes_polygons(fake_easyocr, img_path,
                                                tmp_path):
    det = EasyOCRDetector(languages=["en"])
    out = str(tmp_path / "mask.png")
    mask = det.generate_text_mask(img_path, output_path=out)
    assert mask is not None and mask.shape == (80, 100)
    # inside the first box
    assert mask[20, 35] == 255
    # inside the skewed quad
    assert mask[50, 45] == 255
    # outside everything
    assert mask[75, 95] == 0
    assert os.path.exists(out)
    written = cv2.imread(out, cv2.IMREAD_GRAYSCALE)
    np.testing.assert_array_equal(written, mask)


def test_language_switch_reinitializes_reader(fake_easyocr, img_path):
    det = EasyOCRDetector(languages=["en"])
    det.detect_text_regions(img_path)
    assert len(FakeReader.created) == 1
    det.detect_text_regions(img_path, languages=["en", "ch_sim"])
    assert len(FakeReader.created) == 2
    assert FakeReader.created[-1].languages == ["en", "ch_sim"]
    # same languages again: reader is reused
    det.detect_text_regions(img_path, languages=["en", "ch_sim"])
    assert len(FakeReader.created) == 2


def test_batch_process_skip_done(fake_easyocr, tmp_path):
    src = tmp_path / "in"
    dst = tmp_path / "out"
    src.mkdir()
    for i in range(3):
        cv2.imwrite(str(src / f"im{i}.png"),
                    np.full((40, 40, 3), 128, np.uint8))
    det = EasyOCRDetector(languages=["en"])
    stats = det.batch_process(str(src), str(dst))
    assert stats == {"total": 3, "processed": 3, "failed": 0, "skipped": 0}
    # second run: everything skip-done
    stats2 = det.batch_process(str(src), str(dst))
    assert stats2["skipped"] == 3 and stats2["processed"] == 0


def test_ensure_available_raises_without_package(img_path, monkeypatch):
    monkeypatch.setitem(sys.modules, "easyocr", None)
    det = EasyOCRDetector()
    with pytest.raises(ImportError):
        det.ensure_available()
