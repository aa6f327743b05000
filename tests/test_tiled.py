import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.inference.tiled import (
    pad_to_multiple,
    plan_tiles,
    predict_tiled,
    predict_tiled_sharded,
)
from unet_watermark_tpu.parallel import make_mesh


def test_plan_tiles_covers_image():
    coords = plan_tiles(300, 500, 128, 32)
    cover = np.zeros((300, 500), bool)
    for y, x in coords:
        assert y + 128 <= 300 and x + 128 <= 500
        cover[y:y + 128, x:x + 128] = True
    assert cover.all()


def test_pad_to_multiple():
    img = np.zeros((100, 130, 3), np.float32)
    padded, (h, w) = pad_to_multiple(img, 32)
    assert (h, w) == (100, 130)
    assert padded.shape == (128, 160, 3)
    padded2, _ = pad_to_multiple(np.zeros((10, 10, 3), np.float32), 32,
                                 min_size=64)
    assert padded2.shape == (64, 64, 3)


def test_tiled_matches_direct_for_linear_fn():
    """With a translation-equivariant fn (mean filter), tiled+blend must
    reproduce the direct full-image result away from borders."""
    def forward(x):  # (N,T,T,3) -> (N,T,T,1): local 3x3 mean of channel sum
        s = jnp.sum(x, axis=-1, keepdims=True)
        k = jnp.ones((3, 3, 1, 1), jnp.float32) / 9.0
        return jax.lax.conv_general_dilated(
            s, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((160, 224, 3)), jnp.float32)
    tiled = np.asarray(predict_tiled(forward, img, tile=64, overlap=32,
                                     batch=4))
    direct = np.asarray(forward(img[None]))[0]
    # Tile-rim pixels see the conv's zero padding instead of the true
    # neighborhood; the Hann blend down-weights them to ~1% error. Assert
    # that bound plus near-exactness in the aggregate.
    diff = np.abs(tiled[4:-4, 4:-4] - direct[4:-4, 4:-4])
    assert diff.max() < 0.02, diff.max()
    assert diff.mean() < 2e-3, diff.mean()


def test_tiled_sharded_matches_unsharded():
    def forward(x):
        s = jnp.sum(x, axis=-1, keepdims=True)
        return s * 2.0

    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.random((128, 192, 3)), jnp.float32)
    mesh = make_mesh()
    a = np.asarray(predict_tiled_sharded(forward, img, mesh, tile=64,
                                         overlap=32))
    b = np.asarray(predict_tiled(forward, img, tile=64, overlap=32, batch=4))
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_tiled_rejects_small_images():
    with pytest.raises(ValueError):
        predict_tiled(lambda x: x[..., :1], jnp.zeros((32, 32, 3)), tile=64)
