"""Phase-space conv parity (ops/s2d_conv.py): the transforms must be
bit-faithful to the direct convs they replace (float tolerance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.ops import s2d_conv
from unet_watermark_tpu.models.unet import fuse_up_kernel, up_conv, upsample2x


def _direct_conv3x3(x, w3):
    return jax.lax.conv_general_dilated(
        x, w3, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("h,w,ci,co", [(8, 8, 3, 5), (16, 8, 4, 2),
                                       (32, 32, 16, 16), (8, 16, 32, 8)])
def test_s2d_conv3x3_exact(h, w, ci, co):
    rng = np.random.default_rng(h * 100 + ci)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    ref = np.asarray(_direct_conv3x3(x, w3))
    out = np.asarray(s2d_conv.s2d_conv3x3(x, w3))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("h,w,ci,co", [(8, 8, 3, 5), (16, 8, 4, 2),
                                       (16, 16, 16, 8)])
def test_s2d_upconv3x3_exact(h, w, ci, co):
    rng = np.random.default_rng(h * 7 + co)
    x = jnp.asarray(rng.standard_normal((2, h, w, ci)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, ci, co)), jnp.float32)
    k4 = fuse_up_kernel(w3)
    # reference 1: the production lhs-dilated path
    ref_dil = np.asarray(up_conv(x, w3))
    # reference 2: fully naive materialized upsample + conv
    ref_naive = np.asarray(_direct_conv3x3(upsample2x(x), w3))
    out = np.asarray(s2d_conv.s2d_upconv3x3(x, k4))
    np.testing.assert_allclose(ref_dil, ref_naive, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(out, ref_dil, rtol=1e-4, atol=1e-4)


def test_s2d_shifted_layout():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    x2 = np.asarray(s2d_conv.s2d_shifted(x))
    assert x2.shape == (1, 3, 3, 4)
    # X2'[I,J,(a,b)] = x[2I-1+a, 2J-1+b]; I=J=1 -> x[1+a, 1+b]
    np.testing.assert_allclose(
        x2[0, 1, 1], [x[0, 1, 1, 0], x[0, 1, 2, 0],
                      x[0, 2, 1, 0], x[0, 2, 2, 0]])
    # boundary: I=J=0 -> rows/cols -1 are zero except (a,b)=(1,1)
    np.testing.assert_allclose(x2[0, 0, 0], [0, 0, 0, x[0, 0, 0, 0]])


def test_cost_model_choices():
    # thin channels: phase space wins
    assert s2d_conv.s2d_conv_wins(32, 32)
    assert s2d_conv.s2d_conv_wins(64, 64)
    assert s2d_conv.s2d_conv_wins(16, 16)
    # fat channels: direct wins
    assert not s2d_conv.s2d_conv_wins(128, 128)
    assert not s2d_conv.s2d_conv_wins(256, 256)
    assert s2d_conv.s2d_upconv_wins(32, 16)
    assert s2d_conv.s2d_upconv_wins(64, 32)


def test_model_lowering_parity():
    """ConvBnRelu with lowering='s2d' vs 'direct' on the SAME params
    must agree — checkpoints interchange between lowerings."""
    from unet_watermark_tpu.models.unet import ConvBnRelu

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 16)), jnp.float32)
    m_direct = ConvBnRelu(16, dtype=jnp.float32, lowering="direct")
    m_s2d = ConvBnRelu(16, dtype=jnp.float32, lowering="s2d")
    variables = m_direct.init(jax.random.PRNGKey(0), x)
    y_direct = np.asarray(m_direct.apply(variables, x))
    y_s2d = np.asarray(m_s2d.apply(variables, x))
    np.testing.assert_allclose(y_s2d, y_direct, rtol=1e-4, atol=1e-4)


def test_upconv_lowering_parity():
    from unet_watermark_tpu.models.unet import SplitUpConcatConv

    rng = np.random.default_rng(4)
    x_low = jnp.asarray(rng.standard_normal((2, 16, 16, 32)), jnp.float32)
    skip = jnp.asarray(rng.standard_normal((2, 32, 32, 16)), jnp.float32)
    m_direct = SplitUpConcatConv(16, dtype=jnp.float32, lowering="direct")
    m_s2d = SplitUpConcatConv(16, dtype=jnp.float32, lowering="s2d")
    variables = m_direct.init(jax.random.PRNGKey(0), x_low, skip)
    y_direct = np.asarray(m_direct.apply(variables, x_low, skip))
    y_s2d = np.asarray(m_s2d.apply(variables, x_low, skip))
    np.testing.assert_allclose(y_s2d, y_direct, rtol=1e-4, atol=2e-4)


def test_default_seg_weights_resolution(tmp_path, monkeypatch):
    """model_path=None resolves shipped npz weights (env override path)."""
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.inference.predict import default_seg_weights
    from unet_watermark_tpu.models import create_model_from_config, init_model
    from unet_watermark_tpu.utils.shipping import (save_params_npz,
                                                   seg_weights_filename)

    cfg = get_cfg_defaults()
    cfg.DATA.IMG_SIZE = 64
    cfg.MODEL.ENCODER_NAME = "resnet18"
    assert default_seg_weights(cfg) is None or isinstance(
        default_seg_weights(cfg), str)
    model = create_model_from_config(cfg)
    variables = init_model(model, 64, seed=1)
    path = str(tmp_path / seg_weights_filename(cfg))
    save_params_npz(path, dict(variables))
    monkeypatch.setenv("PREDICT_SEG_WEIGHTS", path)
    assert default_seg_weights(cfg) == path

    from unet_watermark_tpu.inference.predict import WatermarkPredictor

    pred = WatermarkPredictor(model_path=None, config=cfg)
    # loaded (bf16-roundtripped) shipped weights, not a fresh random init
    k = jax.tree_util.tree_leaves(pred.variables["params"])[0]
    k0 = jax.tree_util.tree_leaves(variables["params"])[0]
    np.testing.assert_allclose(np.asarray(k, np.float32),
                               np.asarray(k0, np.float32), rtol=1e-2,
                               atol=1e-2)


def test_gradients_flow():
    """The transforms are differentiable (training can use them too)."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    w3 = jnp.asarray(rng.standard_normal((3, 3, 4, 4)), jnp.float32)

    def loss(w3):
        return jnp.sum(s2d_conv.s2d_conv3x3(x, w3) ** 2)

    g = jax.grad(loss)(w3)
    # parity with the direct path's gradient
    def loss_ref(w3):
        return jnp.sum(_direct_conv3x3(x, w3) ** 2)

    g_ref = jax.grad(loss_ref)(w3)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-3, atol=1e-3)
