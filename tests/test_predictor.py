"""End-to-end predictor pipeline tests (steps 1-5 + fused path)."""
import os

import cv2
import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.inference import WatermarkPredictor
from unet_watermark_tpu.ocr import BuiltinTextDetector, get_ocr_detector


def small_cfg(img=64):
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = img
    cfg.PREDICT.BATCH_SIZE = 4
    return cfg


@pytest.fixture(scope="module")
def input_folder(tmp_path_factory):
    d = tmp_path_factory.mktemp("inputs")
    rng = np.random.default_rng(0)
    for i in range(6):
        h, w = rng.choice([64, 96]), rng.choice([64, 96])
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"img_{i}.jpg", quality=95)
    return str(d)


@pytest.fixture(scope="module")
def predictor():
    return WatermarkPredictor(model_path=None, config=small_cfg())


def test_predict_mask_single(predictor, input_folder):
    p = os.path.join(input_folder, sorted(os.listdir(input_folder))[0])
    mask = predictor.predict_mask(p)
    img = cv2.imread(p)
    assert mask.shape == img.shape[:2]
    assert mask.dtype == np.uint8
    assert set(np.unique(mask)).issubset({0, 255})


def test_predict_mask_text_and_mixed(predictor, input_folder):
    p = os.path.join(input_folder, sorted(os.listdir(input_folder))[0])
    for fn in (predictor.predict_text_watermark_mask,
               predictor.predict_mixed_watermark_mask):
        mask = fn(p)
        assert mask.dtype == np.uint8


def test_step1_writes_masks_and_skips_done(predictor, input_folder,
                                           tmp_path):
    out = str(tmp_path / "masks")
    results = predictor.step1_batch_predict_watermark_masks(
        input_folder, out)
    # every processed entry has an existing mask file named <stem>_mask.png
    for fi in results:
        assert os.path.exists(fi["mask_path"])
        assert fi["mask_path"].endswith("_mask.png")
        assert 0 <= fi["watermark_ratio"] <= 1
    # re-run skips all existing
    results2 = predictor.step1_batch_predict_watermark_masks(
        input_folder, out)
    assert results2 == []


def test_full_pipeline_process_folder_batch(predictor, input_folder,
                                            tmp_path):
    out = str(tmp_path / "out")
    stats = predictor.process_folder_batch(
        input_folder, out, watermark_model="pushpull",
        text_model="pushpull", use_ocr=True, ocr_engine="builtin",
        steps=1)
    assert stats["status"] == "success"
    assert stats["total_images"] > 0
    assert stats["success_rate"] > 0
    sc = stats["steps_completed"]
    assert sc["step2_watermark_repair"] >= 0
    # final outputs exist as <stem>.png
    finals = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(finals) >= stats["successful_images"] > 0
    # intermediate folders per reference layout
    assert os.path.isdir(os.path.join(out, "step1_masks"))
    assert os.path.isdir(os.path.join(out, "step2_watermark_repaired"))


def test_pipeline_no_unet_no_ocr(predictor, input_folder, tmp_path):
    out = str(tmp_path / "out2")
    stats = predictor.process_folder_batch(
        input_folder, out, use_unet=False, use_ocr=False, steps=1)
    assert stats["status"] == "success"
    finals = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(finals) == stats["total_images"]


def test_fused_repair_fn(predictor, monkeypatch):
    """With the shipped LaMa weights present (they ship in-repo), the
    fused graph MUST compile the learned FFC engine — asserting
    engine_used is the check that would have caught the round-2 bug
    where an orbax-only restore silently dropped the .npz and the
    flagship bench ran push-pull."""
    monkeypatch.delenv("PREDICT_INPAINT_WEIGHTS", raising=False)
    from unet_watermark_tpu.utils import shipping

    assert shipping.resolve("inpaint") is not None, \
        "shipped lama_ffc.npz missing"
    fused = predictor.make_fused_repair_fn()
    assert fused.engine_used == "ffc-lama", fused.engine_used
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    out = np.asarray(fused(x))
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(out).all()
    assert out.min() >= 0 and out.max() <= 1


def test_fused_repair_fn_pushpull_fallback(predictor, monkeypatch):
    """Point the resolver at a nonexistent checkpoint: the fused path
    must fall back to push-pull and say so."""
    monkeypatch.setenv("PREDICT_INPAINT_WEIGHTS", "/nonexistent/w.npz")
    fused = predictor.make_fused_repair_fn()
    assert fused.engine_used == "pushpull"
    x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)),
                    jnp.float32)
    out = np.asarray(fused(x))
    assert np.isfinite(out).all()


def test_builtin_ocr_finds_rendered_text(tmp_path):
    """The builtin detector should find high-contrast overlay text."""
    from PIL import ImageDraw

    img = Image.new("RGB", (200, 100), (30, 30, 30))
    d = ImageDraw.Draw(img)
    d.text((20, 40), "WATERMARK TEXT", fill=(255, 255, 255))
    p = str(tmp_path / "text.png")
    img.save(p)
    det = BuiltinTextDetector()
    regions = det.detect_text_regions(p)
    assert regions, "no text regions found"
    mask = det.generate_text_mask(p)
    assert (mask > 0).any()


def test_ocr_registry_fallback():
    det = get_ocr_detector("easy")  # easyocr missing → builtin fallback
    assert det is not None
    det2 = get_ocr_detector("builtin")
    assert isinstance(det2, BuiltinTextDetector)


def test_ocr_accepts_pil_image():
    """Regression parity with test_ocr_fix.py: PIL inputs must work."""
    img = Image.new("RGB", (64, 64), (255, 255, 255))
    det = BuiltinTextDetector()
    mask = det.generate_text_mask(img)
    assert mask is not None and mask.shape == (64, 64)


def test_predict_mask_tiled_highres(tmp_path):
    """PREDICT.TILED path: high-res input keeps full resolution."""
    cfg = small_cfg(img=64)
    cfg.PREDICT.TILED = True
    cfg.PREDICT.TILE_SIZE = 64
    cfg.PREDICT.TILE_OVERLAP = 16
    rng = np.random.default_rng(0)
    p = str(tmp_path / "big.jpg")
    Image.fromarray((rng.random((200, 300, 3)) * 255).astype(
        np.uint8)).save(p)
    predictor = WatermarkPredictor(model_path=None, config=cfg)
    mask = predictor.predict_mask(p)
    assert mask.shape == (200, 300)
    assert set(np.unique(mask)).issubset({0, 255})


def test_step1_batch_flags_affect_output(tmp_path):
    """MULTI_SCALE_TEST / EDGE_REFINEMENT / CONNECTIVITY_CHECK act in the
    BATCHED step-1 path (unet_text_watermark.yaml:71-74 semantics), not
    only in single-image predict_mask."""
    from unet_watermark_tpu.configs import update_config

    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(3)
    for i in range(3):
        arr = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(d / f"im{i}.png")

    cfg1 = small_cfg()
    # threshold 0 → raw masks are non-empty regardless of the random init,
    # so the flag effects below are decisive
    cfg1.PREDICT.THRESHOLD = 0.0
    base = WatermarkPredictor(model_path=None, config=cfg1)
    out1 = tmp_path / "m1"
    base.step1_batch_predict_watermark_masks(str(d), str(out1))

    cfg2 = small_cfg()
    # take the text-config's predict flags (the yaml that enables them)
    update_config(cfg2, "unet_watermark_tpu/configs/unet_text_watermark.yaml")
    cfg2.MODEL.NAME = "Unet"
    cfg2.MODEL.ENCODER_NAME = "resnet18"
    cfg2.MODEL.DTYPE = "float32"
    cfg2.DATA.IMG_SIZE = 64
    cfg2.PREDICT.BATCH_SIZE = 4
    cfg2.PREDICT.THRESHOLD = 0.0
    assert cfg2.PREDICT.MULTI_SCALE_TEST and cfg2.PREDICT.EDGE_REFINEMENT \
        and cfg2.PREDICT.CONNECTIVITY_CHECK
    # make the connectivity filter decisive: no 64x64 component survives
    cfg2.TEXT_WATERMARK.MIN_COMPONENT_AREA = 100000
    flagged = WatermarkPredictor(model_path=None, config=cfg2)
    out2 = tmp_path / "m2"
    recs = flagged.step1_batch_predict_watermark_masks(str(d), str(out2))
    assert recs == []  # every component filtered by the huge min-area

    changed = False
    for f in sorted(os.listdir(out1)):
        a = cv2.imread(str(out1 / f), 0)
        b = cv2.imread(str(out2 / f), 0)
        assert (b == 0).all()
        changed = changed or (a != b).any()
    assert changed, "flags did not change any batched-step1 output"


def test_step1_tiled_highres_batch(tmp_path):
    """PREDICT.TILED routes large images through native-resolution sliding-
    window inference inside the batched step-1."""
    cfg = small_cfg()
    cfg.PREDICT.TILED = True
    cfg.PREDICT.TILE_SIZE = 64
    cfg.PREDICT.TILE_OVERLAP = 32
    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(5)
    Image.fromarray((rng.random((160, 128, 3)) * 255).astype(np.uint8)).save(
        d / "big.png")
    Image.fromarray((rng.random((64, 64, 3)) * 255).astype(np.uint8)).save(
        d / "small.png")
    pred = WatermarkPredictor(model_path=None, config=cfg)
    out = tmp_path / "masks"
    pred.step1_batch_predict_watermark_masks(str(d), str(out))
    big_mask = cv2.imread(str(out / "big_mask.png"), 0)
    assert big_mask is not None and big_mask.shape == (160, 128)
    small_mask = cv2.imread(str(out / "small_mask.png"), 0)
    assert small_mask is not None and small_mask.shape == (64, 64)
