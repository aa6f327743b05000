"""Text-mode predict flags (multi-scale, edge refinement, connectivity)
and the text diagnosis harness."""
import os

import numpy as np
import pytest
from PIL import Image

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.inference import WatermarkPredictor


@pytest.fixture(scope="module")
def text_cfg():
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64
    cfg.PREDICT.BATCH_SIZE = 2
    cfg.PREDICT.MULTI_SCALE_TEST = True
    cfg.PREDICT.TEST_SCALES = [0.5, 1.0]
    cfg.PREDICT.EDGE_REFINEMENT = True
    cfg.PREDICT.CONNECTIVITY_CHECK = True
    return cfg


def test_text_mode_flags_produce_valid_mask(text_cfg, tmp_path):
    rng = np.random.default_rng(0)
    p = str(tmp_path / "img.jpg")
    Image.fromarray((rng.random((96, 96, 3)) * 255).astype(np.uint8)).save(p)
    predictor = WatermarkPredictor(model_path=None, config=text_cfg)
    mask = predictor.predict_mask(p, mask_type="text")
    assert mask.shape == (96, 96)
    assert set(np.unique(mask)).issubset({0, 255})


def test_multi_scale_differs_from_single(tmp_path):
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64
    cfg.PREDICT.POST_PROCESS = False
    rng = np.random.default_rng(1)
    p = str(tmp_path / "i.jpg")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(p)
    predictor = WatermarkPredictor(model_path=None, config=cfg)
    single = predictor.predict_mask(p)
    cfg.PREDICT.MULTI_SCALE_TEST = True
    cfg.PREDICT.TEST_SCALES = [0.5, 1.0, 1.5]
    # reuse the same weights for comparability
    predictor2 = WatermarkPredictor(model_path=None, config=cfg)
    predictor2.variables = predictor.variables
    predictor2._forward = predictor._forward.__wrapped__ \
        if hasattr(predictor._forward, "__wrapped__") else predictor._forward
    multi = predictor2.predict_mask(p)
    assert multi.shape == single.shape


def test_diagnose_runs():
    from unet_watermark_tpu.text.diagnose import run_all

    report = run_all()
    assert "fonts" in report and "ocr" in report and "pipeline" in report
    assert report["ocr"]["builtin"] == "available"
    assert isinstance(report["pipeline"]["builtin_ocr_found_text"], bool)
