"""UnetTPU lane-aligned tier (models/unet.py LaneAlignedDecoder +
PixelShuffleHead) — the round-5 TPU-native performance architecture."""
import jax
import jax.numpy as jnp
import numpy as np

from unet_watermark_tpu.models.factory import (SMPModelFactory,
                                               init_model)
from unet_watermark_tpu.models.unet import pixel_shuffle

IMG = 64


def test_pixel_shuffle_matches_block_semantics():
    """Each r² channel group becomes one r×r output block, row-major:
    out[n, h*r+a, w*r+b, c] = x[n, h, w, (a*r+b)*cout + c]."""
    rng = np.random.default_rng(0)
    r, cout = 4, 2
    x = rng.standard_normal((2, 3, 5, r * r * cout)).astype(np.float32)
    y = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    assert y.shape == (2, 12, 20, cout)
    for a in range(r):
        for b in range(r):
            np.testing.assert_array_equal(
                y[:, a::r, b::r, :],
                x.reshape(2, 3, 5, r, r, cout)[:, :, :, a, b, :])


def _model(dtype=jnp.float32):
    return SMPModelFactory.create_model("UnetTPU", "resnet34", dtype=dtype)


def test_forward_shapes_and_fp32_logits():
    model = _model(jnp.bfloat16)
    variables = init_model(model, IMG)
    y = model.apply(variables, jnp.zeros((2, IMG, IMG, 3), jnp.float32),
                    train=False)
    assert y.shape == (2, IMG, IMG, 1)
    assert y.dtype == jnp.float32


def test_no_full_resolution_convs():
    """The design invariant: no conv input/output tensor at the full
    resolution, and every conv ≥64 output channels (docs/PERFORMANCE.md
    lane analysis). Checked structurally on the param tree."""
    model = _model()
    variables = init_model(model, IMG)
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    for path, leaf in flat:
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        if "decoder" in keys and keys.endswith("kernel") and leaf.ndim == 4:
            assert leaf.shape[-1] >= 64, (keys, leaf.shape)
    # head conv runs at 1/4 resolution with r²·classes outputs
    head = variables["params"]["segmentation_head"]["conv"]["kernel"]
    assert head.shape == (3, 3, 64, 16)


def test_grads_flow_and_train_mode():
    model = _model()
    variables = init_model(model, IMG)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(2, IMG, IMG, 3)), jnp.float32)

    def loss(p):
        y, _ = model.apply({**variables, "params": p}, x, train=True,
                           mutable=["batch_stats"])
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(variables["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    total = sum(float(jnp.abs(l).sum()) for l in leaves)
    assert total > 0


def test_quant_observe_covers_decoder_convs():
    """The int8 PTQ tier rides on conv2d_maybe_quant paths — the
    lane-aligned decoder's convs (incl. the strided skip reducer) must
    all be observable for calibration."""
    from unet_watermark_tpu.ops import quant

    model = _model()
    variables = init_model(model, IMG)
    store = {}
    with quant.quant_observe(store):
        model.apply(variables, jnp.zeros((1, IMG, IMG, 3), jnp.float32),
                    train=False)
    dec = [k for k in store if k.startswith("decoder/")]
    assert any("skip2_reduce" in k for k in dec), sorted(store)[:10]
    assert any("fuse_conv1" in k for k in dec)
    assert any("block0_conv1" in k for k in dec)


def test_partial_warm_start_loads_encoder():
    """Cross-architecture warm start: every encoder leaf of the shipped
    Unet checkpoint must land in the UnetTPU tree (same resnet34)."""
    import os

    from unet_watermark_tpu.utils.shipping import (load_params_npz,
                                                   weights_dir)

    path = os.path.join(weights_dir(), "seg_unet_resnet34.npz")
    if not os.path.exists(path):
        import pytest
        pytest.skip("no shipped Unet weights")
    model = _model()
    variables = init_model(model, IMG)
    loaded = load_params_npz(path, {"params": variables["params"]},
                             partial=True)
    # encoder subtree fully replaced (nonzero → differs from fresh zeros
    # is not checkable here; instead: every encoder leaf keeps its shape
    # and at least the stem kernel changed vs init)
    before = variables["params"]["encoder"]["conv1"]["kernel"]
    after = loaded["params"]["encoder"]["conv1"]["kernel"]
    assert before.shape == after.shape
    assert not np.allclose(np.asarray(before), np.asarray(after))
