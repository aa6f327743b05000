"""Exactness of the block-Toeplitz lane-packed convs (ops/bt_conv.py)
against the direct lowering, fp32 and under the int8 quant context."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from unet_watermark_tpu.ops import bt_conv
from unet_watermark_tpu.ops.quant import quant_int8


def direct_conv3x3(x, w):
    return lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def direct_upconv(x, k4):
    return lax.conv_general_dilated(
        x, k4, (1, 1), [(2, 2), (2, 2)], lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("cin,cout,hw", [(16, 16, 32), (3, 32, 40),
                                         (24, 8, 16)])
def test_bt_conv3x3_exact(rng, cin, cout, hw):
    x = jnp.asarray(rng.normal(size=(2, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, cin, cout)), jnp.float32)
    ref = direct_conv3x3(x, w)
    out = bt_conv.bt_conv3x3(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("pack", [4, 8, 16])
def test_bt_conv3x3_pack_widths(rng, pack):
    x = jnp.asarray(rng.normal(size=(1, 8, 64, 8)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)), jnp.float32)
    ref = direct_conv3x3(x, w)
    out = bt_conv.bt_conv3x3(x, w, pack=pack)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_bt_upconv_exact(rng):
    from unet_watermark_tpu.models.unet import fuse_up_kernel

    x = jnp.asarray(rng.normal(size=(2, 16, 24, 32)), jnp.float32)
    w3 = jnp.asarray(rng.normal(size=(3, 3, 32, 16)), jnp.float32)
    k4 = fuse_up_kernel(w3)
    ref = direct_upconv(x, k4)
    out = bt_conv.bt_upconv(x, k4)
    assert out.shape == (2, 32, 48, 16)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def test_bt_conv_int8_matches_direct_int8(rng):
    """Under quant_int8, the packed conv must produce the same quantized
    result as the direct quantized conv: the activation path key and the
    per-channel weight scales replicate exactly."""
    x = jnp.asarray(rng.normal(size=(1, 16, 32, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 16)), jnp.float32)
    scales = {"tail": float(jnp.max(jnp.abs(x)))}
    with quant_int8(scales):
        ref = jax.jit(lambda a, b: direct_quant(a, b))(x, w)
    with quant_int8(scales):
        out = jax.jit(lambda a, b: bt_conv.bt_conv3x3(a, b,
                                                      path="tail"))(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-4)


def direct_quant(x, w):
    from unet_watermark_tpu.ops.quant import conv2d_maybe_quant

    return conv2d_maybe_quant(x, w, strides=(1, 1),
                              padding=[(1, 1), (1, 1)], path="tail")


def test_model_forward_bt_matches_direct(rng):
    """Full UNet forward with the bt override must match the direct
    lowering bit-for-bit in intent (fp32 tolerance in practice)."""
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models import create_model_from_config, init_model
    from unet_watermark_tpu.ops import bt_conv

    cfg = get_cfg_defaults()
    cfg.MODEL.NAME = "Unet"
    model = create_model_from_config(cfg)
    v = init_model(model, 128, seed=0)
    x = jnp.asarray(rng.normal(size=(1, 128, 128, 3)), jnp.float32)
    ref = model.apply(v, x, train=False)
    bt_conv.LOWERING_OVERRIDE = "bt"
    try:
        out = jax.jit(lambda a: model.apply(v, a, train=False))(x)
    finally:
        bt_conv.LOWERING_OVERRIDE = None
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_choose_pack_rule():
    assert bt_conv.choose_pack(16, 512) == 8
    assert bt_conv.choose_pack(32, 256) == 4
    assert bt_conv.choose_pack(8, 512) == 16
    assert bt_conv.choose_pack(64, 512) is None   # lanes half-full already
    assert bt_conv.choose_pack(16, 100) is None   # width not divisible
    assert bt_conv.choose_pack(16, 64) is None    # too narrow to amortize
    assert bt_conv.choose_pack(24, 512) is None   # 128 % 24 != 0
