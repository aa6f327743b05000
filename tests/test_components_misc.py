"""Tests: diffusion backends (fallback paths), classify, car_logo, text
trainer, inpaint training, model size tools, integration generator."""
import json
import os
import subprocess
import sys

import cv2
import numpy as np
import pytest
from PIL import Image, ImageDraw


@pytest.fixture(scope="module")
def images_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(6):
        arr = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
        if i % 2:
            arr[:40] = arr[:40] // 4  # two visual groups
        Image.fromarray(arr).save(d / f"x{i}.jpg", quality=95)
    return str(d)


def test_sd3_remover_fallback(images_dir, tmp_path):
    from unet_watermark_tpu.diffusion import (
        SDWatermarkRemover,
        diffusers_available,
    )

    assert not diffusers_available()  # this image has no diffusers
    sd = SDWatermarkRemover()
    img = cv2.imread(os.path.join(images_dir, "x0.jpg"))
    mask = np.zeros(img.shape[:2], np.uint8)
    mask[20:40, 20:40] = 255
    out = sd.remove_watermark_with_mask(img, mask)
    assert out.shape == img.shape
    # known pixels unchanged, hole changed
    assert (out[0, 0] == img[0, 0]).all()
    # guard: oversized mask also resolves via fallback without crash
    big = np.full(img.shape[:2], 255, np.uint8)
    out2 = sd.remove_watermark_with_mask(img, big)
    assert out2.shape == img.shape
    stats = sd.process_folder(images_dir, str(tmp_path / "sdout"), limit=2)
    assert stats["processed"] == 2


def test_sd3_text_detection_guards():
    from unet_watermark_tpu.diffusion import SDWatermarkRemover

    img = np.full((128, 128, 3), 40, np.uint8)
    cv2.putText(img, "WM TEXT", (10, 64), cv2.FONT_HERSHEY_SIMPLEX, 0.8,
                (255, 255, 255), 2)
    sd = SDWatermarkRemover(min_region_area=50)
    mask = sd.detect_text_regions(img)
    assert mask.shape == (128, 128)


def test_flux_processor_fallback(images_dir, tmp_path):
    from unet_watermark_tpu.diffusion import FluxProcessor
    from unet_watermark_tpu.diffusion.flux_process import normalize_size

    assert normalize_size(2000, 1000) == (1024, 512)
    assert normalize_size(300, 300)[0] >= 512
    assert normalize_size(800, 600) == (800, 600)
    fp = FluxProcessor(ocr_engine="builtin")
    stats = fp.process_batch(images_dir, str(tmp_path / "flux"), limit=2)
    assert stats["processed"] == 2


def test_classifier_clusters(images_dir, tmp_path):
    from unet_watermark_tpu.scripts.classify_image import (
        StableImageClassifier,
        dbscan_group,
    )

    c = StableImageClassifier(cache_path=str(tmp_path / "feat.npz"))
    assignment = c.stable_cluster_images(images_dir, n_clusters=2)
    assert len(assignment) == 6
    assert set(assignment.values()) == {0, 1}
    # determinism
    c2 = StableImageClassifier(cache_path=str(tmp_path / "feat.npz"))
    assignment2 = c2.stable_cluster_images(images_dir, n_clusters=2)
    assert assignment == assignment2
    c.copy_clusters(assignment, str(tmp_path / "clusters"))
    assert os.path.isdir(tmp_path / "clusters" / "cluster_0")
    groups = dbscan_group(images_dir, eps=0.9)
    assert len(groups) == 6


def test_logo_process(tmp_path):
    from unet_watermark_tpu.car_logo import remove_background_and_resize

    img = Image.new("RGB", (100, 60), (255, 255, 255))
    d = ImageDraw.Draw(img)
    d.ellipse([20, 10, 80, 50], fill=(200, 30, 30))
    p = str(tmp_path / "logo.jpg")
    img.save(p)
    out = remove_background_and_resize(p, str(tmp_path / "out.png"),
                                       size=128)
    arr = np.array(out)
    assert arr.shape == (128, 128, 4)
    assert (arr[..., 3] == 0).any()      # background transparent
    assert (arr[..., 3] == 255).any()    # logo opaque


def test_logo_placement(tmp_path):
    from unet_watermark_tpu.car_logo import LogoPlacer

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "cars")
    os.makedirs(tmp_path / "logos")
    for i in range(2):
        cv2.imwrite(str(tmp_path / "cars" / f"car{i}.jpg"),
                    (rng.random((120, 160, 3)) * 255).astype(np.uint8))
    logo = np.zeros((40, 40, 4), np.uint8)
    logo[10:30, 10:30] = [0, 0, 255, 255]
    cv2.imwrite(str(tmp_path / "logos" / "l.png"), logo)
    placer = LogoPlacer(seed=0)
    stats = placer.batch_process(str(tmp_path / "cars"),
                                 str(tmp_path / "logos"),
                                 str(tmp_path / "out"))
    assert sum(stats[k] for k in ("homography", "template", "random")) == 2
    outs = os.listdir(tmp_path / "out" / "watermarked")
    assert len(outs) == 2
    mask = cv2.imread(str(tmp_path / "out" / "masks" / "car0.png"), 0)
    assert (mask > 0).any()


def test_text_trainer_method_eval(tmp_path, images_dir):
    from unet_watermark_tpu.text import TextWatermarkTrainer

    t = TextWatermarkTrainer(data_root=str(tmp_path / "data"))
    t.cfg.MODEL.NAME = "Unet"
    t.cfg.MODEL.ENCODER_NAME = "resnet18"
    t.cfg.MODEL.DTYPE = "float32"
    t.cfg.DATA.IMG_SIZE = 64
    stats = t.generate_training_data(images_dir, count=6)
    assert sum(v for k, v in stats.items() if k != "skipped") > 0
    results = t.evaluate_methods(
        os.path.join(images_dir, "x0.jpg"), str(tmp_path / "eval"))
    assert os.path.exists(results["grid"])
    for m in ("watermark", "text", "mixed"):
        assert os.path.exists(results[m]["mask_path"])


def test_train_inpaint_short(tmp_path, images_dir):
    from unet_watermark_tpu.training.train_inpaint import (
        random_mask_batch,
        train_inpaint,
    )
    import jax

    masks = np.asarray(random_mask_batch(jax.random.PRNGKey(0), 4, 64))
    assert masks.shape == (4, 64, 64, 1)
    assert 0 < masks.mean() < 0.9
    r = train_inpaint(images_dir, str(tmp_path / "lama_ckpt"),
                      img_size=64, batch_size=2, steps=6, log_every=2)
    assert r["checkpoint"] and os.path.isdir(r["checkpoint"])
    # history entries are dicts of scalars (g_loss/d_loss/hole_psnr)
    assert r["history"], "no history logged"
    for entry in r["history"]:
        for k, v in entry.items():
            if k != "step":
                assert np.isfinite(v), f"{k} not finite: {v}"
    # engine loads the trained weights
    from unet_watermark_tpu.inference.engines import get_engine
    import jax.numpy as jnp

    e = get_engine("lama", weights_path=r["checkpoint"])
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    msk = jnp.zeros((1, 64, 64, 1), jnp.float32).at[:, 20:30, 20:30].set(1.0)
    out = np.asarray(e(img, msk))
    assert np.isfinite(out).all()


def test_model_size_tools():
    from unet_watermark_tpu.models.model_size import (
        compare_model_sizes,
        get_model_size,
    )

    info = get_model_size("Unet", "resnet18")
    assert info["parameters"] > 1_000_000
    rows = compare_model_sizes(models=["Unet"], encoders=["resnet18"],
                               print_table=False)
    assert rows[0]["parameters"] == info["parameters"]


def test_integration_generator(tmp_path):
    sys.path.insert(0, "/root/repo")
    from integrate_optimization import OptimizationIntegrator

    out = OptimizationIntegrator(str(tmp_path)).integrate_all()
    for path in out.values():
        assert os.path.exists(path)
    # generated wrappers are importable
    sys.path.insert(0, str(tmp_path))
    try:
        import optimized_trainer  # noqa: F401
        import optimized_predictor  # noqa: F401
    finally:
        sys.path.remove(str(tmp_path))
