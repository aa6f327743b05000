"""Dataset tooling tests: check, enhance_masks, image_fixer,
watermark_filter, extract_watermarks, batch_repair_optimizer."""
import os

import cv2
import numpy as np
import pytest
from PIL import Image

from unet_watermark_tpu.scripts.check import is_black_mask, validate_dataset
from unet_watermark_tpu.scripts.enhance_masks import (
    enhance_folder,
    enhance_mask,
    yolo_to_mask,
)
from unet_watermark_tpu.scripts.extract_watermarks import WatermarkExtractor
from unet_watermark_tpu.scripts.image_fixer import ImageFixer


@pytest.fixture()
def triad_root(tmp_path):
    for d in ("watermarked", "clean", "masks"):
        os.makedirs(tmp_path / d)
    rng = np.random.default_rng(0)
    for i in range(3):
        arr = (rng.random((48, 48, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / "watermarked" / f"i{i}.jpg")
        Image.fromarray(arr).save(tmp_path / "clean" / f"i{i}.jpg")
        mask = np.zeros((48, 48), np.uint8)
        if i != 2:
            mask[10:30, 10:30] = 255
        Image.fromarray(mask).save(tmp_path / "masks" / f"i{i}.png")
    # one watermarked without clean/mask
    Image.fromarray((rng.random((48, 48, 3)) * 255).astype(np.uint8)).save(
        tmp_path / "watermarked" / "orphanless.jpg")
    # corrupted file
    (tmp_path / "watermarked" / "bad.jpg").write_bytes(b"nope")
    return tmp_path


def test_validate_dataset_detect(triad_root):
    s = validate_dataset(str(triad_root))
    assert s["problems"]["black_mask"] == 1       # i2 all-black
    assert s["problems"]["missing_mask"] >= 1     # orphanless + bad
    assert s["problems"]["corrupted"] == 1
    assert s["total_watermarked"] == 5


def test_validate_dataset_move(triad_root):
    s = validate_dataset(str(triad_root), mode="move")
    assert s["handled"]
    q = triad_root / "quarantine"
    assert q.exists() and len(list(q.iterdir())) >= 1


def test_is_black_mask(tmp_path):
    black = np.zeros((32, 32), np.uint8)
    p = str(tmp_path / "b.png")
    cv2.imwrite(p, black)
    assert is_black_mask(p)
    black[0:10, 0:10] = 255
    cv2.imwrite(p, black)
    assert not is_black_mask(p)


def test_enhance_mask_widens(tmp_path):
    mask = np.zeros((64, 64), np.uint8)
    mask[30:34, 30:34] = 255
    out = enhance_mask(mask)
    assert (out > 0).sum() > (mask > 0).sum()
    assert set(np.unique(out)).issubset({0, 255})
    # folder mode
    os.makedirs(tmp_path / "in")
    cv2.imwrite(str(tmp_path / "in" / "m.png"), mask)
    n = enhance_folder(str(tmp_path / "in"), str(tmp_path / "out"))
    assert n == 1 and os.path.exists(tmp_path / "out" / "m.png")


def test_yolo_to_mask(tmp_path):
    label = tmp_path / "img.txt"
    label.write_text("0 0.5 0.5 0.5 0.5\n1 0.1 0.1 0.1 0.1\n")
    mask = yolo_to_mask(str(label), (100, 100))
    assert mask[50, 50] == 255
    assert mask[10, 10] == 255
    mask0 = yolo_to_mask(str(label), (100, 100), class_filter=0)
    assert mask0[50, 50] == 255 and mask0[10, 10] == 0


def test_image_fixer(tmp_path):
    good = (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(
        np.uint8)
    Image.fromarray(good).save(tmp_path / "good.jpg")
    # truncated jpeg
    data = (tmp_path / "good.jpg").read_bytes()
    (tmp_path / "trunc.jpg").write_bytes(data[: len(data) // 2])
    fixer = ImageFixer(backup_dir=str(tmp_path / "bak"))
    s = fixer.scan_folder(str(tmp_path), fix=False)
    assert s["checked"] == 2
    assert s["corrupted"] == 1
    s2 = fixer.scan_folder(str(tmp_path), fix=True)
    assert s2["corrupted"] >= 1  # attempted fix; backup exists
    assert os.path.isdir(tmp_path / "bak")


def test_watermark_extractor(tmp_path):
    rng = np.random.default_rng(0)
    clean = (rng.random((128, 128, 3)) * 200).astype(np.uint8)
    wm = clean.copy()
    wm[20:50, 20:80] = 255  # bright watermark block
    os.makedirs(tmp_path / "wm")
    os.makedirs(tmp_path / "cl")
    cv2.imwrite(str(tmp_path / "wm" / "a.png"), wm)
    cv2.imwrite(str(tmp_path / "cl" / "a.png"), clean)
    ex = WatermarkExtractor()
    stats = ex.batch_extract(str(tmp_path / "wm"), str(tmp_path / "cl"),
                             str(tmp_path / "out"))
    assert stats["pairs"] == 1
    assert stats["assets"] >= 1
    assets = list((tmp_path / "out").iterdir())
    rgba = np.array(Image.open(assets[0]))
    assert rgba.shape[-1] == 4
    assert (rgba[..., 3] > 0).any()


def test_batch_repair_optimizer(tmp_path):
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.inference import WatermarkPredictor
    from unet_watermark_tpu.scripts.batch_repair_optimizer import (
        BatchRepairOptimizer,
    )

    rng = np.random.default_rng(0)
    os.makedirs(tmp_path / "in")
    for i in range(5):
        Image.fromarray((rng.random((64, 64, 3)) * 255).astype(
            np.uint8)).save(tmp_path / "in" / f"x{i}.jpg")
    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64
    cfg.PREDICT.BATCH_SIZE = 4
    predictor = WatermarkPredictor(model_path=None, config=cfg)
    opt = BatchRepairOptimizer(predictor, chunk_size=3)
    result = opt.run(str(tmp_path / "in"), str(tmp_path / "out"),
                     use_ocr=False, steps=1, watermark_model="pushpull")
    assert result["total_images"] == 5
    assert len(result["chunks"]) >= 1


def test_validate_dataset_fragmented_mask_native(tmp_path):
    """Fragmented-mask detection runs through the native C++ CC runtime
    (native/maskops.cpp) with component stats in the summary."""
    import cv2

    root = tmp_path / "ds"
    for sub in ("watermarked", "clean", "masks"):
        (root / sub).mkdir(parents=True)
    img = np.full((64, 64, 3), 128, np.uint8)
    cv2.imwrite(str(root / "watermarked" / "a.png"), img)
    cv2.imwrite(str(root / "clean" / "a.png"), img)
    # speckle mask: 100+ isolated dots (spaced 2px so 8-connectivity
    # keeps them separate)
    frag = np.zeros((64, 64), np.uint8)
    frag[::4, ::4] = 255
    cv2.imwrite(str(root / "masks" / "a.png"), frag)
    # healthy second triad
    cv2.imwrite(str(root / "watermarked" / "b.png"), img)
    cv2.imwrite(str(root / "clean" / "b.png"), img)
    solid = np.zeros((64, 64), np.uint8)
    solid[10:40, 10:40] = 255
    cv2.imwrite(str(root / "masks" / "b.png"), solid)

    s = validate_dataset(str(root), fragment_limit=64)
    assert s["problems"]["fragmented_mask"] == 1
    assert s["mask_stats"]["analyzed"] == 2
    assert s["mask_stats"]["max_components"] == 256
    # fragmented masks are report-only: nothing deleted in detect mode
    assert s["handled"] == []


def test_extractor_uses_native_cc(tmp_path):
    """cluster_regions goes through utils.native connected components."""
    from unet_watermark_tpu.scripts.extract_watermarks import (
        WatermarkExtractor,
    )
    from unet_watermark_tpu.utils import native

    mask = np.zeros((100, 100), np.uint8)
    mask[10:30, 10:40] = 255
    mask[60:80, 55:90] = 255
    ex = WatermarkExtractor(eps_ratio=0.05)
    boxes = ex.cluster_regions(mask)
    assert len(boxes) == 2
    assert native.native_available()  # toolchain present in this image
