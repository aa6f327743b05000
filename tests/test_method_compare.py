"""Per-method mask comparison report (scripts/method_compare.py) —
the analog of reference src/text/test_text_watermark.py:57-128."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def sample(tmp_path_factory):
    d = tmp_path_factory.mktemp("mc")
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (96, 96, 3), np.uint8)
    img[30:60, 30:60] = 255  # bright square "watermark"
    p = str(d / "img.jpg")
    cv2.imwrite(p, img)
    gt = np.zeros((96, 96), np.uint8)
    gt[30:60, 30:60] = 255
    gp = str(d / "img_mask.png")
    cv2.imwrite(gp, gt)
    return p, gp


def test_compare_methods_produces_artifacts(sample, tmp_path):
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.scripts import method_compare

    img_path, gt_path = sample
    out = str(tmp_path / "report")
    # small model config for CPU speed
    cfg_yaml = str(tmp_path / "cfg.yaml")
    with open(cfg_yaml, "w") as f:
        f.write("DATA:\n  IMG_SIZE: 96\nMODEL:\n  NAME: unet\n"
                "  ENCODER_NAME: resnet18\nPREDICT:\n  BATCH_SIZE: 2\n")
    r = method_compare.compare_methods(img_path, out, model_path=None,
                                       config_path=cfg_yaml,
                                       gt_mask_path=gt_path)
    assert set(r["masks"]) == set(method_compare.METHODS)
    for name in method_compare.METHODS:
        assert os.path.exists(os.path.join(out, f"img_{name}_mask.png"))
        s = r["scores"][name]
        assert 0.0 <= s["iou"] <= 1.0
    assert os.path.exists(r["grid"])
    assert os.path.exists(os.path.join(out, "img_metrics.txt"))


def test_gt_autodiscovery(sample, tmp_path):
    """<stem>_mask.png next to the image is found without --gt-mask."""
    from unet_watermark_tpu.scripts import method_compare

    img_path, _ = sample
    out = str(tmp_path / "report2")
    cfg_yaml = str(tmp_path / "cfg.yaml")
    with open(cfg_yaml, "w") as f:
        f.write("DATA:\n  IMG_SIZE: 96\nMODEL:\n  NAME: unet\n"
                "  ENCODER_NAME: resnet18\n")
    r = method_compare.compare_methods(img_path, out, config_path=cfg_yaml)
    assert r["scores"] is not None
