"""bf16 .npz weight shipping (utils/shipping.py) + engine npz loading."""
import numpy as np
import jax.numpy as jnp

from unet_watermark_tpu.utils import shipping


def _tree():
    return {
        "params": {
            "conv": {"kernel": jnp.arange(12, dtype=jnp.float32)
                     .reshape(3, 4) / 7.0},
            "bn": {"scale": jnp.ones((4,), jnp.float32)},
        },
        "batch_stats": {"bn": {"mean": jnp.zeros((4,), jnp.float32)}},
        "step": jnp.asarray(7, jnp.int32),
    }


def test_npz_roundtrip(tmp_path):
    tree = _tree()
    path = str(tmp_path / "w.npz")
    shipping.save_params_npz(path, tree)
    out = shipping.load_params_npz(path, _tree())
    # floats survive at bf16 precision; ints exactly
    np.testing.assert_allclose(
        np.asarray(out["params"]["conv"]["kernel"], np.float32),
        np.asarray(tree["params"]["conv"]["kernel"], np.float32),
        rtol=1e-2)
    assert int(out["step"]) == 7


def test_npz_shape_mismatch_raises(tmp_path):
    import pytest

    tree = _tree()
    path = str(tmp_path / "w.npz")
    shipping.save_params_npz(path, tree)
    bad = _tree()
    bad["params"]["bn"]["scale"] = jnp.ones((5,), jnp.float32)
    with pytest.raises(ValueError):
        shipping.load_params_npz(path, bad)


def test_engine_loads_npz(tmp_path):
    """get_engine('lama') with an npz checkpoint compiles the FFC engine,
    not the pushpull fallback."""
    from unet_watermark_tpu.models.lama import create_lama, init_lama
    from unet_watermark_tpu.inference import engines

    model = create_lama("lama")
    variables = init_lama(model, img_size=64, seed=0)
    path = str(tmp_path / "lama_ffc.npz")
    shipping.save_params_npz(path, dict(variables))
    eng = engines.get_engine("lama", weights_path=path)
    img = jnp.ones((1, 64, 64, 3), jnp.float32) * 0.5
    msk = jnp.zeros((1, 64, 64, 1), jnp.float32)
    out = eng(img, msk)
    assert out.shape == img.shape
    # known pixels pass through exactly (composited output)
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-3)
