"""Fused decoder (lhs-dilated up-conv + split concat) vs naive path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.models import SMPModelFactory, init_model
from unet_watermark_tpu.models.unet import fuse_up_kernel, up_conv, upsample2x


def test_up_conv_equals_upsample_then_conv():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 5)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 5, 7)), jnp.float32)
    naive = jax.lax.conv_general_dilated(
        upsample2x(x), w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    fused = up_conv(x, w)
    assert fused.shape == naive.shape == (2, 16, 16, 7)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(naive),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("arch", ["Unet", "UnetPlusPlus"])
def test_fused_model_matches_naive(arch):
    """Same params (identical tree), identical outputs."""
    kwargs = dict(model_name=arch, encoder_name="resnet18",
                  dtype=jnp.float32)
    fused = SMPModelFactory.create_model(fused=True, **kwargs)
    naive = SMPModelFactory.create_model(fused=False, **kwargs)
    vf = init_model(fused, 64, seed=3)
    vn = init_model(naive, 64, seed=3)
    # identical parameter trees (names + values)
    tf = jax.tree_util.tree_structure(vf["params"])
    tn = jax.tree_util.tree_structure(vn["params"])
    assert tf == tn
    for a, b in zip(jax.tree_util.tree_leaves(vf["params"]),
                    jax.tree_util.tree_leaves(vn["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 64, 64, 3)),
                    jnp.float32)
    yf = fused.apply(vf, x, train=False)
    yn = naive.apply(vn, x, train=False)
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yn), rtol=1e-4,
                               atol=1e-4)


def test_fused_checkpoint_interchangeable(tmp_path):
    """A .pth exported from the naive model loads into the fused one."""
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.models.torch_import import export_pth, import_pth

    naive = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32,
        fused=False)
    vn = init_model(naive, 64, seed=7)
    path = str(tmp_path / "naive.pth")
    export_pth(path, get_cfg_defaults(), vn["params"], vn["batch_stats"])

    fused = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32,
        fused=True)
    vf = init_model(fused, 64, seed=99)
    imported, report = import_pth(path, vf)
    assert not report["missing"]
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, 64, 64, 3)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(naive.apply(vn, x, train=False)),
        np.asarray(fused.apply(imported, x, train=False)),
        rtol=1e-4, atol=1e-4)


def test_fuse_up_kernel_shape():
    w = jnp.ones((3, 3, 2, 4))
    k = fuse_up_kernel(w)
    assert k.shape == (4, 4, 2, 4)
    # center taps accumulate all four shifts
    assert float(k[1, 1, 0, 0]) == 4.0
