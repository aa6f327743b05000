"""CLI + scripts tests: train/repair subcommands, video generator,
model selector, auto-train cycle on tiny synthetic data."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from unet_watermark_tpu.cli import build_parser, main as cli_main
from unet_watermark_tpu.data.gen_data import generate_dataset


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    ws = tmp_path_factory.mktemp("ws")
    clean = ws / "data" / "clean"
    clean.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray((rng.random((96, 96, 3)) * 220).astype(
            np.uint8)).save(clean / f"c{i}.jpg", quality=95)
    generate_dataset(str(clean), str(ws / "data" / "train"), count=12,
                     seed=2)
    test_dir = ws / "data" / "test"
    test_dir.mkdir()
    for i in range(3):
        Image.fromarray((rng.random((96, 96, 3)) * 255).astype(
            np.uint8)).save(test_dir / f"t{i}.jpg", quality=95)
    return ws


def _cfg_file(ws):
    cfg = f"""
MODEL:
  NAME: "Unet"
  ENCODER_NAME: "resnet18"
  DTYPE: "float32"
DATA:
  ROOT_DIR: "{ws}/data/train"
  IMG_SIZE: 64
  NUM_WORKERS: 2
TRAIN:
  BATCH_SIZE: 4
  EPOCHS: 1
  LR: 0.001
  CHECKPOINT_DIR: "{ws}/ckpts"
  OUTPUT_DIR: "{ws}/out"
  MODEL_SAVE_PATH: "{ws}/model.pth"
PREDICT:
  BATCH_SIZE: 4
"""
    p = ws / "cfg.yaml"
    p.write_text(cfg)
    return str(p)


def test_parser_covers_reference_flags():
    parser = build_parser()
    args = parser.parse_args([
        "repair", "--input", "a", "--output", "b", "--model", "m.pth",
        "--watermark-model", "lama", "--text-model", "mat", "--no-ocr",
        "--steps", "2", "--limit", "5", "--ocr-engine", "easy"])
    assert args.command == "repair"
    assert args.steps == 2 and args.no_ocr
    args = parser.parse_args(["train", "-c", "x.yaml", "--epochs", "3",
                              "--use-blurred-mask", "--opts", "TRAIN.LR",
                              "0.01"])
    assert args.epochs == 3 and args.use_blurred_mask
    args = parser.parse_args(["auto", "--max-cycles", "2"])
    assert args.max_cycles == 2


def test_cli_train_then_repair(workspace):
    cfg = _cfg_file(workspace)
    rc = cli_main(["train", "-c", cfg, "--device", "cpu", "--epochs", "1"])
    assert rc == 0
    assert os.path.exists(str(workspace / "model.pth"))

    out = str(workspace / "repair_out")
    rc = cli_main([
        "repair", "-c", cfg, "--device", "cpu",
        "--model", str(workspace / "model.pth"),
        "--input", str(workspace / "data" / "test"),
        "--output", out, "--no-ocr", "--steps", "1",
        "--watermark-model", "pushpull"])
    assert rc == 0
    summary = json.load(open(os.path.join(out, "repair_summary.json")))
    assert summary["status"] == "success"
    assert summary["total_images"] == 3


def test_video_generator(workspace, tmp_path):
    from unet_watermark_tpu.scripts.video_generator import VideoGenerator

    orig = str(workspace / "data" / "test")
    rep = str(tmp_path / "rep")
    os.makedirs(rep)
    rng = np.random.default_rng(1)
    for f in os.listdir(orig):
        stem = os.path.splitext(f)[0]
        Image.fromarray((rng.random((96, 96, 3)) * 255).astype(
            np.uint8)).save(os.path.join(rep, f"{stem}.png"))
    gen = VideoGenerator(width=320, height=240, duration_per_image=0.2,
                         fps=5)
    out = str(tmp_path / "cmp.mp4")
    assert gen.create_side_by_side_video(orig, rep, out) == out
    assert os.path.getsize(out) > 1000
    out2 = str(tmp_path / "switch.mp4")
    assert gen.create_comparison_video(orig, rep, out2) == out2
    # three-way with masks
    masks = str(tmp_path / "masks")
    os.makedirs(masks)
    for f in os.listdir(orig):
        stem = os.path.splitext(f)[0]
        m = (rng.random((96, 96)) > 0.8).astype(np.uint8) * 255
        Image.fromarray(m).save(os.path.join(masks, f"{stem}.png"))
    out3 = str(tmp_path / "three.mp4")
    assert gen.create_three_way_comparison_video(orig, rep, masks,
                                                 out3) == out3


def test_model_selector_vmapped(workspace, tmp_path):
    """Two checkpoints evaluated in one vmapped graph; best one picked."""
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import SMPModelFactory, init_model
    from unet_watermark_tpu.models.torch_import import export_pth
    from unet_watermark_tpu.scripts.model_selector import ModelSelector

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64

    models_dir = str(tmp_path / "models")
    os.makedirs(models_dir)
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype="float32")
    for seed in (0, 1):
        v = init_model(model, 64, seed=seed)
        export_pth(os.path.join(models_dir, f"m{seed}.pth"), cfg,
                   v["params"], v["batch_stats"])

    sel = ModelSelector(models_dir=models_dir,
                        images_dir=str(workspace / "data" / "test"),
                        output_dir=str(tmp_path / "eval"), config=cfg,
                        num_images=2)
    results = sel.run_evaluation()
    assert len(results["models"]) == 2
    assert results["summary"]["best_detection_model"] is not None
    assert os.path.exists(os.path.join(
        str(tmp_path / "eval"), "model_evaluation_results.json"))
    for m in results["models"].values():
        assert 0 <= m["statistics"]["detection_rate"] <= 1


def test_auto_train_single_cycle(workspace):
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.training.auto_train import (
        AutoTrainConfig,
        AutoTrainingLoop,
    )

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    cfg.MODEL.DTYPE = "float32"
    cfg.DATA.IMG_SIZE = 64
    cfg.DATA.NUM_WORKERS = 2
    cfg.TRAIN.BATCH_SIZE = 4

    ac = AutoTrainConfig(
        project_root=str(workspace), max_cycles=1, epochs_per_cycle=1,
        batch_size=4, output_dir="auto_out", samples=4,
        prediction_limit=2, generate_video=True, inpaint_model="pushpull",
        heldout_eval_dir=str(workspace / "data" / "train"),
        heldout_eval_tex_dir=str(workspace / "data" / "train"),
        heldout_eval_limit=2)
    loop = AutoTrainingLoop(ac, base_cfg=cfg)
    report = loop.run_all_cycles()
    assert report["cycles_completed"] == 1
    assert report["successful_cycles"] == 1, report
    out = workspace / "auto_out"
    assert (out / "cycle_0_info.json").exists()
    assert (out / "final_report.json").exists()
    info = json.load(open(out / "cycle_0_info.json"))
    assert info["steps"]["training"]["epochs_run"] >= 1
    assert info["steps"]["data_augmentation"]["generated"] > 0
    # the per-cycle held-out eval scored the cycle's checkpoint on the
    # frozen protocol (orbax dir loaded through the unified registry)
    held = info["steps"]["heldout_eval"]
    assert held["error"] is None
    assert held["n_images"] == 2
    assert 0.0 <= held["raw"]["iou"] <= 1.0
    # round 5: both tiers reported per cycle (heldout_eval_tex_dir)
    for tier in ("smooth", "textured"):
        assert 0.0 <= held[tier]["raw"]["iou"] <= 1.0


def test_cli_repair_with_video(workspace, tmp_path):
    """--video produces a comparison MP4 next to repair_summary.json."""
    cfg = _cfg_file(workspace)
    out = str(tmp_path / "vid_out")
    rc = cli_main([
        "repair", "-c", cfg, "--device", "cpu",
        "--model", str(workspace / "model.pth"),
        "--input", str(workspace / "data" / "test"),
        "--output", out, "--no-ocr", "--steps", "1",
        "--watermark-model", "pushpull", "--video",
        "--video-width", "320", "--video-height", "240",
        "--duration", "0.2", "--fps", "5"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "comparison_video.mp4"))
    assert os.path.getsize(os.path.join(out, "comparison_video.mp4")) > 500
