import os

import cv2
import numpy as np
import pytest
from PIL import Image

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.data import (
    DataPipeline,
    WatermarkDataset,
    create_datasets,
)
from unet_watermark_tpu.data.gen_data import generate_dataset
from unet_watermark_tpu.parallel import make_mesh


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic ROOT/{watermarked,clean,masks} tree (12 images)."""
    clean = tmp_path_factory.mktemp("cleansrc")
    rng = np.random.default_rng(0)
    for i in range(4):
        arr = (rng.random((80, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(clean / f"c{i}.jpg", quality=95)
    root = tmp_path_factory.mktemp("root")
    generate_dataset(str(clean), str(root), logos_dir=None, count=12, seed=3)
    return str(root)


def test_dataset_loads_with_masks(data_root):
    ds = WatermarkDataset(
        watermarked_dirs=os.path.join(data_root, "watermarked"),
        clean_dirs=os.path.join(data_root, "clean"),
        mask_dirs=os.path.join(data_root, "masks"),
        img_size=64)
    assert len(ds) > 0
    img, mask = ds[0]
    assert img.shape == (64, 64, 3) and img.dtype == np.uint8
    assert mask.shape == (64, 64)
    assert (mask > 0).any()


def test_mask_generation_absdiff(tmp_path):
    """No masks dir → absdiff generation path, cached to disk."""
    wdir, cdir, mdir = (tmp_path / d for d in ("watermarked", "clean",
                                               "masks"))
    for d in (wdir, cdir):
        os.makedirs(d)
    rng = np.random.default_rng(1)
    clean = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
    wm = clean.copy()
    wm[10:30, 10:30] = 255  # a bright watermark patch
    Image.fromarray(clean).save(cdir / "a.png")
    Image.fromarray(wm).save(wdir / "a.png")
    ds = WatermarkDataset(str(wdir), str(cdir), str(mdir), img_size=64,
                          generate_mask_threshold=30)
    img, mask = ds[0]
    assert (mask[12:28, 12:28] > 0).mean() > 0.9
    assert (mask[40:, 40:] > 0).mean() < 0.05
    assert os.path.exists(mdir / "a.png")  # cached


def test_corrupted_image_skipped(tmp_path):
    wdir = tmp_path / "watermarked"
    os.makedirs(wdir)
    (wdir / "bad.jpg").write_bytes(b"not an image")
    arr = np.zeros((32, 32, 3), np.uint8)
    Image.fromarray(arr).save(wdir / "good.jpg")
    ds = WatermarkDataset(str(wdir), img_size=32)
    img, mask = ds[0]  # "bad.jpg" sorts first; loader must skip to good
    assert img.shape == (32, 32, 3)


def test_create_datasets_split(data_root):
    cfg = get_cfg_defaults()
    cfg.DATA.ROOT_DIR = data_root
    cfg.DATA.IMG_SIZE = 64
    cfg.DATA.CACHE_IMAGES = True
    train, val = create_datasets(cfg)
    n = len(train) + len(val)
    assert n > 0
    assert abs(len(train) - int(0.8 * n)) <= 1
    # determinism
    train2, val2 = create_datasets(cfg)
    assert train.indices == train2.indices


def test_pipeline_batches_and_padding(data_root):
    ds = WatermarkDataset(
        watermarked_dirs=os.path.join(data_root, "watermarked"),
        mask_dirs=os.path.join(data_root, "masks"), img_size=64)
    mesh = make_mesh()  # 8 virtual CPU devices
    pipe = DataPipeline(ds, batch_size=8, mesh=mesh, shuffle=True, seed=0,
                        num_workers=2)
    batches = list(pipe)
    assert len(batches) == (len(ds) + 7) // 8
    for b in batches:
        assert b["image"].shape == (8, 64, 64, 3)
        assert b["image"].dtype == np.uint8  # 4x smaller H2D copies
        assert b["mask"].shape == (8, 64, 64, 1)
        assert b["valid"].shape == (8,)
    total_valid = sum(float(np.asarray(b["valid"]).sum()) for b in batches)
    assert int(total_valid) == len(ds)
    # batch must actually be sharded over the mesh
    shard0 = batches[0]["image"].sharding
    assert shard0.num_devices == 8


def test_pipeline_epoch_reshuffle(data_root):
    ds = WatermarkDataset(
        watermarked_dirs=os.path.join(data_root, "watermarked"),
        mask_dirs=os.path.join(data_root, "masks"), img_size=64)
    pipe = DataPipeline(ds, batch_size=4, shuffle=True, seed=0,
                        num_workers=2)
    e1 = [float(np.asarray(b["image"]).sum()) for b in pipe]
    e2 = [float(np.asarray(b["image"]).sum()) for b in pipe]
    # same samples overall, different batch composition across epochs
    assert sum(e1) == pytest.approx(sum(e2), rel=1e-5)
    assert e1 != pytest.approx(e2)


def test_pipeline_early_break_no_thread_leak(data_root):
    """Abandoning iteration mid-epoch must release the producer thread."""
    import threading
    import time

    ds = WatermarkDataset(
        watermarked_dirs=os.path.join(data_root, "watermarked"),
        mask_dirs=os.path.join(data_root, "masks"), img_size=64)
    pipe = DataPipeline(ds, batch_size=2, shuffle=False, num_workers=2,
                        prefetch=1)
    before = threading.active_count()
    for _ in range(4):
        for b in pipe:
            break  # abandon after one batch
    time.sleep(1.0)
    after = threading.active_count()
    assert after <= before + 1, (before, after)


def test_decoded_cache_identical_and_hits(data_root, tmp_path):
    """Second access serves the memmap (source deleted → still works)."""
    from unet_watermark_tpu.data.decoded_cache import DecodedCache

    ds = WatermarkDataset(
        watermarked_dirs=os.path.join(data_root, "watermarked"),
        mask_dirs=os.path.join(data_root, "masks"), img_size=64)
    cached = DecodedCache(ds, str(tmp_path))
    img0, mask0 = cached[1]          # populate
    # swap in a dataset whose decode would now fail: cache must answer
    cached.dataset = None
    img1, mask1 = cached[1]
    np.testing.assert_array_equal(img0, img1)
    np.testing.assert_array_equal(mask0, mask1)
    assert img1.dtype == np.uint8 and mask1.dtype == np.uint8
    # a second DecodedCache over the same dataset reuses the directory
    cached2 = DecodedCache(ds, str(tmp_path))
    assert cached2.dir == cached.dir
    assert int(cached2.present[1]) == 1


def test_decoded_cache_fingerprint_changes_with_size(data_root, tmp_path):
    from unet_watermark_tpu.data.decoded_cache import DecodedCache

    kw = dict(watermarked_dirs=os.path.join(data_root, "watermarked"),
              mask_dirs=os.path.join(data_root, "masks"))
    a = DecodedCache(WatermarkDataset(img_size=64, **kw), str(tmp_path))
    b = DecodedCache(WatermarkDataset(img_size=32, **kw), str(tmp_path))
    assert a.dir != b.dir


def test_create_datasets_wraps_decoded_cache(data_root, tmp_path):
    from unet_watermark_tpu.data.decoded_cache import DecodedCache

    cfg = get_cfg_defaults()
    cfg.DATA.ROOT_DIR = data_root
    cfg.DATA.IMG_SIZE = 64
    cfg.DATA.CACHE_DIR = str(tmp_path)
    train_ds, val_ds = create_datasets(cfg)
    assert isinstance(train_ds.dataset, DecodedCache)
    assert isinstance(val_ds.dataset, DecodedCache)
    img, mask = train_ds[0]
    assert img.shape == (64, 64, 3)
    # blurred-mask train mode must NOT cache (fresh noise per access)
    train_b, val_b = create_datasets(cfg, use_blurred_mask=True)
    assert not isinstance(train_b.dataset, DecodedCache)
    assert isinstance(val_b.dataset, DecodedCache)


def test_device_pipeline_matches_dataset(data_root):
    """DeviceDataPipeline serves the same uint8 content as the dataset,
    pads the remainder with valid=0, and reshuffles per epoch."""
    from unet_watermark_tpu.data.pipeline import DeviceDataPipeline

    ds = WatermarkDataset(
        watermarked_dirs=os.path.join(data_root, "watermarked"),
        mask_dirs=os.path.join(data_root, "masks"), img_size=64)
    n = len(ds)
    p = DeviceDataPipeline(ds, batch_size=4, shuffle=False)
    seen = 0
    for b in p:
        assert b["image"].dtype == np.uint8
        assert b["mask"].shape[-1] == 1
        seen += int(np.asarray(b["valid"]).sum())
    assert seen == n
    first = next(iter(DeviceDataPipeline(ds, batch_size=4, shuffle=False)))
    img0, mask0 = ds[0]
    np.testing.assert_array_equal(np.asarray(first["image"][0]), img0)
    np.testing.assert_array_equal(
        np.asarray(first["mask"][0, ..., 0]),
        (mask0 > (127 if mask0.dtype == np.uint8 else 0.5)).astype(np.uint8))
    # shuffled epochs differ
    ps = DeviceDataPipeline(ds, batch_size=4, shuffle=True, seed=3)
    e1 = np.concatenate([np.asarray(b["image"]) for b in ps])
    e2 = np.concatenate([np.asarray(b["image"]) for b in ps])
    assert not np.array_equal(e1, e2)


def test_make_pipelines_selects_device_cache(data_root):
    """Single-device + corpus under budget -> DeviceDataPipeline;
    multi-device mesh or DEVICE_CACHE off -> host DataPipeline."""
    from unet_watermark_tpu.data.pipeline import (DataPipeline,
                                                  DeviceDataPipeline,
                                                  make_pipelines)
    from unet_watermark_tpu.parallel import make_mesh

    cfg = get_cfg_defaults()
    cfg.DATA.ROOT_DIR = data_root
    cfg.DATA.IMG_SIZE = 64
    cfg.TRAIN.BATCH_SIZE = 4
    train_ds, val_ds = create_datasets(cfg)
    tr, va = make_pipelines(cfg, train_ds, val_ds, mesh=None)
    assert isinstance(tr, DeviceDataPipeline)
    assert isinstance(va, DeviceDataPipeline)

    mesh = make_mesh()  # 8 virtual devices
    tr8, _ = make_pipelines(cfg, train_ds, val_ds, mesh=mesh)
    assert isinstance(tr8, DataPipeline)

    cfg.DATA.DEVICE_CACHE = False
    tr1, _ = make_pipelines(cfg, train_ds, val_ds, mesh=None)
    assert isinstance(tr1, DataPipeline)

    cfg.DATA.DEVICE_CACHE = True
    cfg.DATA.DEVICE_CACHE_MB = 0
    tr2, _ = make_pipelines(cfg, train_ds, val_ds, mesh=None)
    assert isinstance(tr2, DataPipeline)


def test_mask_bitpack_roundtrip():
    """np.packbits -> device unpack_mask_bits is exact for any {0,1} mask
    with width % 8 == 0 (the resident-mask HBM footprint trick)."""
    import numpy as np

    from unet_watermark_tpu.data.pipeline import unpack_mask_bits

    rng = np.random.default_rng(3)
    m = (rng.random((4, 16, 24)) > 0.6).astype(np.uint8)
    packed = np.packbits(m, axis=-1)
    out = np.asarray(unpack_mask_bits(packed))
    np.testing.assert_array_equal(out, m)
