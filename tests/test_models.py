import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.models import (
    SMPModelFactory,
    SUPPORTED_MODELS,
    count_parameters,
    init_model,
)

IMG = 64  # small spatial size for CPU tests (stride-32 → 2x2 deepest)


def _run(model, img=IMG, batch=2):
    variables = init_model(model, img, batch=1)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(batch, img, img, 3)),
                    jnp.float32)
    y = model.apply(variables, x, train=False)
    return variables, y


@pytest.mark.parametrize("arch", list(SUPPORTED_MODELS))
def test_all_architectures_forward(arch):
    model = SMPModelFactory.create_model(
        model_name=arch, encoder_name="resnet18", dtype=jnp.float32)
    _, y = _run(model)
    assert y.shape == (2, IMG, IMG, 1)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.parametrize("encoder", ["resnet34", "resnet50", "efficientnet-b0"])
def test_encoders_with_unetpp(encoder):
    model = SMPModelFactory.create_model(
        model_name="UnetPlusPlus", encoder_name=encoder, dtype=jnp.float32)
    _, y = _run(model)
    assert y.shape == (2, IMG, IMG, 1)


def test_param_count_resnet34_unetpp_ballpark():
    """Reference UNet++/resnet34 is ~24M params fp32
    (/root/reference/src/models/check_model_size.py:31-36). The canonical
    dense decoder differs slightly from SMP's channel plan; assert the
    same ballpark."""
    model = SMPModelFactory.create_model(
        model_name="UnetPlusPlus", encoder_name="resnet34", dtype=jnp.float32)
    variables = init_model(model, IMG)
    n = count_parameters(variables)
    assert 15_000_000 < n < 40_000_000, n


def test_bf16_compute_fp32_logits():
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.bfloat16)
    variables = init_model(model, IMG)
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    y = model.apply(variables, x, train=False)
    assert y.dtype == jnp.float32
    # params stored fp32
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32


def test_train_mode_updates_batch_stats():
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32)
    variables = init_model(model, IMG)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, IMG, IMG, 3)),
                    jnp.float32)
    y, mutated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"])
    assert y.shape == (2, IMG, IMG, 1)
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_activation_sigmoid():
    model = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", activation="sigmoid",
        dtype=jnp.float32)
    _, y = _run(model)
    y = np.asarray(y)
    assert (y >= 0).all() and (y <= 1).all()


def test_unsupported_model_raises():
    with pytest.raises(ValueError):
        SMPModelFactory.create_model(model_name="NotAModel")


def test_available_encoders():
    enc = SMPModelFactory.get_available_encoders()
    assert "resnet34" in enc and "efficientnet-b3" in enc


def test_remat_forward_and_grad():
    """MODEL.REMAT path (large config): remat'd encoder must produce the
    same outputs and support backward."""
    base = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32,
        remat=False)
    rem = SMPModelFactory.create_model(
        model_name="Unet", encoder_name="resnet18", dtype=jnp.float32,
        remat=True)
    vb = init_model(base, IMG, seed=4)
    vr = init_model(rem, IMG, seed=4)
    # same parameter tree and values
    assert jax.tree_util.tree_structure(vb["params"]) == \
        jax.tree_util.tree_structure(vr["params"])
    x = jnp.asarray(np.random.default_rng(2).normal(size=(1, IMG, IMG, 3)),
                    jnp.float32)
    yb = base.apply(vb, x, train=False)
    yr = rem.apply(vr, x, train=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(yr), rtol=1e-5,
                               atol=1e-5)

    def loss(params):
        out, _ = rem.apply({"params": params,
                            "batch_stats": vr["batch_stats"]}, x,
                           train=True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g = jax.grad(loss)(vr["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
