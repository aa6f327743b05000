"""Int8 PTQ inference tier (ops/quant.py, scripts/calibrate_quant.py).

The TPU-native analog of the reference's quantized backend variant
(/root/reference/src/flux/flux_process_nunchaku.py:23). Covers: QConv
param-tree compatibility with nn.Conv, the int8 conv arithmetic against
its dequantized float reference, observe→int8 calibration round-trip on
a real model, sidecar persistence, and the predictor integration.
"""
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from unet_watermark_tpu.configs import get_cfg_defaults
from unet_watermark_tpu.models import create_model_from_config, init_model
from unet_watermark_tpu.ops import quant


def test_qconv_param_tree_matches_nn_conv():
    """QConv must keep nn.Conv's {kernel[,bias]} layout so every shipped
    checkpoint (npz/pth/orbax) loads unchanged."""
    x = jnp.zeros((1, 8, 8, 5))
    ref = nn.Conv(7, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                  dtype=jnp.bfloat16)
    qcv = quant.QConv(7, (3, 3), padding=[(1, 1), (1, 1)],
                      dtype=jnp.bfloat16)
    vr = ref.init(jax.random.PRNGKey(0), x)
    vq = qcv.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(vr) == jax.tree_util.tree_structure(vq)
    for a, b in zip(jax.tree_util.tree_leaves(vr),
                    jax.tree_util.tree_leaves(vq)):
        assert a.shape == b.shape and a.dtype == b.dtype


def test_qconv_no_context_matches_float_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    got = quant.conv2d_maybe_quant(x, w, path="some/conv")
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)


def _dequant_reference(x, w, amax):
    """Float emulation of the int8 path: conv of the quantize-dequantized
    operands. fp32 conv of values that are exact small integers times a
    scale is bit-equivalent to the int32 accumulation."""
    xq, sx = quant.quantize_activation(x, amax)
    wq, sw = quant.quantize_weight(w)
    ref = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return ref * (sx * sw)


@pytest.mark.parametrize("lhs_dilation", [None, (2, 2)])
def test_int8_conv_matches_dequantized_reference(lhs_dilation):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    amax = float(jnp.max(jnp.abs(x)))
    pad = [(2, 2), (2, 2)] if lhs_dilation else [(1, 1), (1, 1)]
    with quant.quant_int8({"p": amax}):
        got = quant.conv2d_maybe_quant(x, w, path="p", padding=pad,
                                       lhs_dilation=lhs_dilation)
    xq, sx = quant.quantize_activation(x, amax)
    wq, sw = quant.quantize_weight(w)
    ref = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), (1, 1), pad,
        lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC")) * (sx * sw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_missing_scale_falls_back_to_float():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 4)), jnp.float32)
    with quant.quant_int8({}) as mode:
        got = quant.conv2d_maybe_quant(x, w, path="nope")
    ref = quant.conv2d_maybe_quant(x, w, path="nope")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
    assert mode.missing == {"nope"}


@pytest.mark.parametrize("model_name", ["Unet", "UnetPlusPlus"])
def test_observe_then_int8_full_model(model_name):
    """Every conv in the flagship models is observed, and the jitted int8
    forward stays close to the float forward."""
    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 64
    cfg.MODEL.NAME = model_name
    model = create_model_from_config(cfg)
    v = init_model(model, 64, seed=0)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)
    store = {}
    with quant.quant_observe(store):
        model.apply(v, x, train=False)
    assert len(store) >= 30  # resnet34 encoder alone has 36 convs
    assert all(s > 0 for s in store.values())

    ref = model.apply(v, x, train=False)
    with quant.quant_int8(store) as mode:
        out = jax.jit(lambda v, x: model.apply(v, x, train=False))(v, x)
    assert not mode.missing
    # random-init logits are small; bound the relative L1 error
    rel = float(jnp.abs(out - ref).mean() / (jnp.abs(ref).mean() + 1e-9))
    assert rel < 0.15, rel
    # and the thresholded masks mostly agree
    agree = float(jnp.mean((out > 0) == (ref > 0)))
    assert agree > 0.95, agree


def test_int8_forward_under_dp_mesh():
    """The quantized forward partitions over a device mesh: jit with the
    batch sharded 8-way DP and check it matches the single-device int8
    result (the dryrun_multichip int8 check's pytest mirror)."""
    import numpy as np

    from unet_watermark_tpu.parallel import batch_sharding, make_mesh

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 32
    cfg.MODEL.NAME = "Unet"
    cfg.MODEL.ENCODER_NAME = "resnet18"
    model = create_model_from_config(cfg)
    v = init_model(model, 32, seed=0)
    x = np.random.default_rng(0).random((8, 32, 32, 3)).astype(np.float32)

    store = {}
    with quant.quant_observe(store):
        model.apply(v, jnp.asarray(x), train=False)

    with quant.quant_int8(store) as mode:
        fwd = jax.jit(lambda v, t: model.apply(v, t, train=False))
        ref = fwd(v, jnp.asarray(x))
        mesh = make_mesh()
        sharded = jax.device_put(jnp.asarray(x), batch_sharding(mesh))
        out = fwd(v, sharded)
    assert not mode.missing
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_scales_json_roundtrip(tmp_path):
    scales = {"encoder/conv1": 2.64, "decoder/block0/conv1/conv:up": 11.0}
    p = str(tmp_path / "x.quant.json")
    quant.save_scales(p, scales)
    assert quant.load_scales(p) == scales


def test_calibrate_script_writes_sidecar(tmp_path, monkeypatch):
    """End-to-end calibrate on a tiny procedural set with a tiny model
    input size, against the shipped flagship weights."""
    from unet_watermark_tpu.scripts import calibrate_quant

    out = str(tmp_path / "scales.quant.json")
    try:
        sidecar = calibrate_quant.calibrate(
            model_name="Unet", encoder="resnet34", img_size=64,
            n_images=2, batch=2, workdir=str(tmp_path / "wd"), out=out)
    except FileNotFoundError:
        pytest.skip("no shipped seg weights in this checkout")
    assert sidecar == out and os.path.exists(out)
    scales = quant.load_scales(out)
    assert len(scales) >= 30
    assert all(v > 0 for v in scales.values())


def _procedural_batch(workdir: str, n: int = 4, size: int = 64) -> np.ndarray:
    """A tiny procedurally watermarked batch in [0,1] fp32 NHWC."""
    import cv2

    from unet_watermark_tpu.data.gen_data import generate_dataset
    from unet_watermark_tpu.data.synth_clean import (generate_clean_dataset,
                                                     generate_logo_set)

    clean = os.path.join(workdir, "clean")
    logos = os.path.join(workdir, "logos")
    root = os.path.join(workdir, "set")
    generate_clean_dataset(clean, count=n, size=size, seed=1)
    generate_logo_set(logos, count=4, seed=2)
    generate_dataset(clean, root, logos_dir=logos, count=n, seed=3)
    wm = os.path.join(root, "watermarked")
    imgs = []
    for name in sorted(os.listdir(wm))[:n]:
        rgb = cv2.cvtColor(cv2.imread(os.path.join(wm, name)),
                           cv2.COLOR_BGR2RGB)
        imgs.append(cv2.resize(rgb, (size, size)).astype(np.float32) / 255.0)
    return np.stack(imgs)


def test_predictor_quant_tier(tmp_path):
    """PREDICT.QUANT routes the predictor forward through int8 and keeps
    mask outputs consistent with the bf16 tier."""
    from unet_watermark_tpu.inference.predict import WatermarkPredictor
    from unet_watermark_tpu.scripts import calibrate_quant
    from unet_watermark_tpu.utils.shipping import resolve

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 64
    cfg.MODEL.NAME = "Unet"
    wp = resolve("seg", cfg=cfg)
    if not wp or not os.path.exists(wp):
        pytest.skip("no shipped seg weights in this checkout")
    sidecar = calibrate_quant.quant_sidecar_path(wp)
    made_sidecar = not os.path.exists(sidecar)
    if made_sidecar:
        calibrate_quant.calibrate(model_name="Unet", encoder="resnet34",
                                  img_size=64, n_images=2, batch=2,
                                  workdir=str(tmp_path / "wd"), out=sidecar)
    try:
        base = WatermarkPredictor(config=cfg)
        cfg_q = get_cfg_defaults()
        cfg_q.DATA.IMG_SIZE = 64
        cfg_q.MODEL.NAME = "Unet"
        cfg_q.PREDICT.QUANT = True
        quantp = WatermarkPredictor(config=cfg_q)
        assert quantp._quant_scales, "sidecar did not load"
        # in-distribution input (PTQ scales are calibrated on the training
        # distribution; random noise saturates the int8 range and is the
        # wrong yardstick — measured: noise agrees 0.89, real data 0.99)
        x = _procedural_batch(str(tmp_path / "imgs"), n=4, size=64)
        pb = base._forward_probs(x)
        pq = quantp._forward_probs(x)
        # probabilities shift a little under PTQ; thresholded masks agree
        assert np.abs(pb - pq).mean() < 0.03
        assert np.mean((pb > 0.5) == (pq > 0.5)) > 0.97
    finally:
        if made_sidecar and os.path.exists(sidecar):
            os.remove(sidecar)
