"""Ship gate (scripts/ship_gate.py) + calibration sidecar bindings."""
import json
import os

import numpy as np

from unet_watermark_tpu.ops import quant
from unet_watermark_tpu.scripts import ship_gate
from unet_watermark_tpu.scripts.calibrate_quant import (file_sha256,
                                                        quant_sidecar_path)


def test_sidecar_meta_roundtrip(tmp_path):
    path = str(tmp_path / "scales.quant.json")
    quant.save_scales(path, {"a/conv": 1.5, "b/conv": 2.0},
                      meta={"weights_sha256": "abc123"})
    scales = quant.load_scales(path)
    assert scales == {"a/conv": 1.5, "b/conv": 2.0}
    meta = quant.load_sidecar_meta(path)
    assert meta == {"weights_sha256": "abc123"}


def test_old_sidecars_still_load(tmp_path):
    """Pre-round-5 sidecars (no meta) must keep loading unchanged."""
    path = str(tmp_path / "old.quant.json")
    with open(path, "w") as f:
        json.dump({"x/conv": 0.25}, f)
    assert quant.load_scales(path) == {"x/conv": 0.25}
    assert quant.load_sidecar_meta(path) == {}


def test_check_sidecars_verdicts(tmp_path):
    wdir = str(tmp_path)
    ckpt = os.path.join(wdir, "seg_fake_resnet34.npz")
    np.savez(ckpt, **{"params/x": np.zeros(3, np.float32)})
    # 1. no sidecar at all
    errs = ship_gate.check_sidecars(wdir)
    assert len(errs) == 1 and "no calibration sidecar" in errs[0]
    # 2. sidecar without hash binding
    sidecar = quant_sidecar_path(ckpt)
    quant.save_scales(sidecar, {"c": 1.0})
    errs = ship_gate.check_sidecars(wdir)
    assert len(errs) == 1 and "no weights_sha256" in errs[0]
    # 3. wrong hash (calibrated for a different checkpoint)
    quant.save_scales(sidecar, {"c": 1.0},
                      meta={"weights_sha256": "deadbeef"})
    errs = ship_gate.check_sidecars(wdir)
    assert len(errs) == 1 and "DIFFERENT" in errs[0]
    # 4. matching hash → clean
    quant.save_scales(sidecar, {"c": 1.0},
                      meta={"weights_sha256": file_sha256(ckpt)})
    assert ship_gate.check_sidecars(wdir) == []


def test_check_quality_docs_detects_staleness(tmp_path, monkeypatch):
    from unet_watermark_tpu.scripts.quality_report import (AUTOGEN_BEGIN,
                                                           AUTOGEN_END)

    repo = tmp_path
    (repo / "workspace" / "quality").mkdir(parents=True)
    (repo / "docs").mkdir()
    report = {
        "protocol": {"clean_seed": 1, "compose_seed": 2, "img_size": 64,
                     "n_images": 4},
        "segmentation": {},
        "inpaint": {},
        "e2e_repair": {"floor": {"psnr_to_clean_db": 30.0,
                                 "region_psnr_db": 20.0}},
    }
    with open(repo / "workspace" / "quality" / "quality_report.json",
              "w") as f:
        json.dump(report, f)
    monkeypatch.setattr(ship_gate, "REPO", str(repo))
    # stale: docs block says something else
    (repo / "docs" / "QUALITY.md").write_text(
        f"x\n{AUTOGEN_BEGIN}\nold stuff\n{AUTOGEN_END}\ny\n")
    errs = ship_gate.check_quality_docs()
    assert len(errs) == 1 and "STALE" in errs[0]
    # fresh: write the real render
    from unet_watermark_tpu.scripts.quality_report import render_markdown
    (repo / "docs" / "QUALITY.md").write_text(
        f"x\n{AUTOGEN_BEGIN}\n{render_markdown(report)}\n{AUTOGEN_END}\ny\n")
    assert ship_gate.check_quality_docs() == []
