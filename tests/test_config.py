import os

import pytest

from unet_watermark_tpu.configs import Config, get_cfg_defaults, update_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..",
                       "unet_watermark_tpu", "configs")


def test_defaults_match_reference_tree():
    cfg = get_cfg_defaults()
    assert cfg.MODEL.NAME == "UnetPlusPlus"
    assert cfg.MODEL.ENCODER_NAME == "resnet34"
    assert cfg.MODEL.DECODER_CHANNELS == [256, 128, 64, 32, 16]
    assert cfg.DATA.IMG_SIZE == 512
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.LOSS.NAME == "DiceLoss"
    assert cfg.OPTIMIZER.LR_SCHEDULER == "ReduceLROnPlateau"
    assert cfg.PREDICT.THRESHOLD == 0.5


@pytest.mark.parametrize("name,encoder,img", [
    ("unet_watermark.yaml", "resnet34", 512),
    ("unet_watermark_large.yaml", "resnet50", 1024),
    ("unet_text_watermark.yaml", "efficientnet-b3", 512),
])
def test_yaml_variants_load(name, encoder, img):
    cfg = get_cfg_defaults()
    update_config(cfg, os.path.join(CFG_DIR, name))
    assert cfg.MODEL.ENCODER_NAME == encoder
    assert cfg.DATA.IMG_SIZE == img


def test_text_config_loss_and_sched():
    cfg = get_cfg_defaults()
    update_config(cfg, os.path.join(CFG_DIR, "unet_text_watermark.yaml"))
    assert cfg.LOSS.NAME == "CombinedLoss"
    assert cfg.LOSS.FOCAL_WEIGHT == 0.2
    assert cfg.OPTIMIZER.NAME == "AdamW"
    assert cfg.OPTIMIZER.LR_SCHEDULER == "CosineAnnealingWarmRestarts"
    assert cfg.PREDICT.TEXT_MODE is True
    assert cfg.TEXT_WATERMARK.CLAHE_CLIP_LIMIT == 2.5


def test_override_list_and_paths():
    cfg = get_cfg_defaults()
    cfg.merge_from_list(["TRAIN.LR", "0.001", "DATA.IMG_SIZE", "256",
                         "MODEL.NAME", "Unet", "TRAIN.USE_AMP", "true"])
    assert cfg.TRAIN.LR == 0.001
    assert cfg.DATA.IMG_SIZE == 256
    assert cfg.MODEL.NAME == "Unet"
    assert cfg.TRAIN.USE_AMP is True
    assert cfg.get_by_path("TRAIN.LR") == 0.001


def test_clone_and_roundtrip(tmp_path):
    cfg = get_cfg_defaults()
    cfg.TRAIN.LR = 0.123
    c2 = cfg.clone()
    assert c2.TRAIN.LR == 0.123
    c2.TRAIN.LR = 0.5
    assert cfg.TRAIN.LR == 0.123  # deep copy
    p = tmp_path / "cfg.yaml"
    cfg.to_yaml(str(p))
    c3 = get_cfg_defaults()
    update_config(c3, str(p))
    assert c3.TRAIN.LR == 0.123


def test_unknown_override_raises():
    cfg = get_cfg_defaults()
    with pytest.raises(AttributeError):
        cfg.set_by_path("TRAIN.NOPE", "1")
