"""Frozen quality protocol (scripts/quality_report.py) at toy scale."""
import json
import os

import numpy as np
import pytest

from unet_watermark_tpu.scripts import quality_report as qr


@pytest.fixture(scope="module")
def frozen_root(tmp_path_factory):
    wd = str(tmp_path_factory.mktemp("quality"))
    root = qr.ensure_frozen_set(wd, n=6, img_size=64)
    return wd, root


def test_frozen_set_reproducible(frozen_root, tmp_path):
    """Same seeds → byte-identical held-out set in a different directory."""
    import hashlib

    _, root = frozen_root
    root2 = qr.ensure_frozen_set(str(tmp_path), n=6, img_size=64)

    def digest(r):
        h = hashlib.sha1()
        for sub in ("watermarked", "masks"):
            d = os.path.join(r, sub)
            for f in sorted(os.listdir(d)):
                h.update(f.encode())
                h.update(open(os.path.join(d, f), "rb").read())
        return h.hexdigest()

    assert digest(root) == digest(root2)


def test_textured_tier_frozen_and_distinct(frozen_root):
    """The textured tier (seeds 7800/7801) is reproducible and actually
    different content from the smooth tier."""
    import hashlib

    wd, root = frozen_root
    root_tex = qr.ensure_frozen_set(wd, n=6, img_size=64, textured=True)
    assert root_tex != root
    a = sorted(os.listdir(os.path.join(root, "watermarked")))
    b = sorted(os.listdir(os.path.join(root_tex, "watermarked")))
    assert len(b) >= 6
    ha = hashlib.sha1(open(os.path.join(root, "watermarked", a[0]),
                           "rb").read()).hexdigest()
    hb = hashlib.sha1(open(os.path.join(root_tex, "watermarked", b[0]),
                           "rb").read()).hexdigest()
    assert ha != hb


def test_textured_images_have_more_high_frequency_energy():
    """The textured tier must actually contain the high-frequency
    statistics it claims (mean |Laplacian| well above the smooth tier)."""
    import cv2

    from unet_watermark_tpu.data.synth_clean import (synth_clean_image,
                                                     synth_textured_image)

    def hf(img):
        g = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
        return float(np.abs(cv2.Laplacian(g, cv2.CV_32F)).mean())

    rngs = [np.random.default_rng(s) for s in range(6)]
    smooth = np.mean([hf(synth_clean_image(r, 128)) for r in rngs[:3]])
    tex = np.mean([hf(synth_textured_image(r, 128)) for r in rngs[3:]])
    assert tex > 1.5 * smooth, (smooth, tex)


def test_render_markdown_two_tiers():
    tier = {
        "segmentation": {"unet_resnet34": {
            "weights": "w", "model": "Unet", "encoder": "resnet34",
            "n_images": 2,
            "raw": {"iou": 0.5, "f1": 0.6, "precision": 0.7, "recall": 0.5},
            "pipeline": {"iou": 0.55, "f1": 0.6, "precision": 0.7,
                         "recall": 0.5}}},
        "inpaint": {"pushpull": {"hole_psnr_db": 20.0, "ssim": 0.9,
                                 "n_images": 2}},
        "e2e_repair": {"n_images": 2,
                       "floor": {"psnr_to_clean_db": 30.0,
                                 "region_psnr_db": 20.0},
                       "lama": {"engine_used": "ffc-lama",
                                "psnr_to_clean_db": 40.0,
                                "region_psnr_db": 30.0}},
    }
    report = {"protocol": {"clean_seed": qr.CLEAN_SEED,
                           "compose_seed": qr.COMPOSE_SEED,
                           "tex_clean_seed": qr.TEX_CLEAN_SEED,
                           "tex_compose_seed": qr.TEX_COMPOSE_SEED,
                           "img_size": 64, "n_images": 2,
                           "tiers": ["smooth", "textured"]},
              "smooth": tier, "textured": tier}
    md = qr.render_markdown(report)
    assert "## Smooth tier" in md and "## Textured tier" in md
    assert md.count("| unet_resnet34 |") == 2
    assert "7800" in md


def test_eval_segmentation_shipped_weights(frozen_root):
    _, root = frozen_root
    r = qr.eval_segmentation(root, limit=4, batch=2,
                             model_name="UnetPlusPlus", encoder="resnet34",
                             img_size=64)
    assert "error" not in r, r
    assert r["n_images"] == 4
    for key in ("raw", "pipeline"):
        for m in ("iou", "f1", "precision", "recall"):
            assert 0.0 <= r[key][m] <= 1.0


def test_eval_e2e_repair_and_markdown(frozen_root, tmp_path):
    wd, root = frozen_root
    e2e = qr.eval_e2e_repair(root, limit=4, batch=4, img_size=64)
    assert e2e["n_images"] == 4
    # the learned engine must actually be the learned engine (the round-2
    # silent-fallback bug class)
    assert e2e["lama"]["engine_used"].startswith("ffc-")
    for k in ("floor", "pushpull", "lama"):
        assert np.isfinite(e2e[k]["psnr_to_clean_db"])

    report = {
        "protocol": {"clean_seed": qr.CLEAN_SEED,
                     "compose_seed": qr.COMPOSE_SEED,
                     "img_size": 64, "n_images": 4},
        "segmentation": {"unetplusplus_resnet34": {
            "weights": "w", "model": "UnetPlusPlus", "encoder": "resnet34",
            "n_images": 4,
            "raw": {"iou": 0.5, "f1": 0.6, "precision": 0.7, "recall": 0.5},
            "pipeline": {"iou": 0.55, "f1": 0.6, "precision": 0.7,
                         "recall": 0.5}}},
        "inpaint": {"pushpull": {"hole_psnr_db": 22.4, "ssim": 0.98,
                                 "n_images": 4}},
        "e2e_repair": e2e,
    }
    md = qr.render_markdown(report)
    assert "| unetplusplus_resnet34 | 0.500 |" in md
    assert "ffc-" in md

    docs = tmp_path / "QUALITY.md"
    qr.update_docs(report, str(docs))
    text = docs.read_text()
    assert qr.AUTOGEN_BEGIN in text and qr.AUTOGEN_END in text
    # regenerating replaces the block, not appends
    qr.update_docs(report, str(docs))
    assert docs.read_text().count(qr.AUTOGEN_BEGIN) == 1
    json.dumps(report)  # the report must stay JSON-serializable
