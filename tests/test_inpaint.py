import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.ops.inpaint import inpaint_pushpull
from unet_watermark_tpu.inference.engines import get_engine


def _scene(n=2, s=64):
    """Smooth gradient images with a square hole."""
    ys, xs = np.mgrid[0:s, 0:s].astype(np.float32) / s
    img = np.stack([ys, xs, (ys + xs) / 2], axis=-1)
    imgs = np.stack([img] * n)
    mask = np.zeros((n, s, s, 1), np.float32)
    mask[:, 24:40, 24:40] = 1.0
    return jnp.asarray(imgs), jnp.asarray(mask)


def test_pushpull_fills_holes_plausibly():
    imgs, mask = _scene()
    # corrupt hole region
    corrupted = jnp.where(mask > 0, 1.0, imgs)
    out = np.asarray(inpaint_pushpull(corrupted, mask))
    # hole should be close to the uncorrupted gradient (smooth scene)
    target = np.asarray(imgs)
    hole = np.asarray(mask)[..., 0] > 0.5
    err = np.abs(out - target)[hole.nonzero()[0][:, None] * 0 + 0]  # noqa
    err_hole = np.abs(out[np.asarray(mask[..., 0]) > 0.5] -
                      target[np.asarray(mask[..., 0]) > 0.5])
    assert err_hole.mean() < 0.05
    # known pixels untouched
    known = np.asarray(mask[..., 0]) < 0.5
    np.testing.assert_allclose(out[known], np.asarray(corrupted)[known],
                               atol=1e-6)


def test_pushpull_output_range_and_shapes():
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((3, 96, 96, 3)), jnp.float32)
    mask = jnp.asarray((rng.random((3, 96, 96, 1)) > 0.9), jnp.float32)
    out = np.asarray(inpaint_pushpull(imgs, mask))
    assert out.shape == (3, 96, 96, 3)
    assert out.min() >= 0 and out.max() <= 1
    assert np.isfinite(out).all()


def test_engine_registry():
    e = get_engine("pushpull")
    imgs, mask = _scene(n=1)
    out = np.asarray(e(imgs, mask))
    assert out.shape == imgs.shape
    with pytest.raises(ValueError):
        get_engine("nonexistent-model")


def test_lama_engine_falls_back_without_weights():
    e = get_engine("lama")  # no weights → pushpull fallback, no crash
    imgs, mask = _scene(n=1)
    out = np.asarray(e(imgs, mask))
    assert np.isfinite(out).all()


def test_lama_generator_forward():
    """FFC generator forward pass: shapes, composite property."""
    from unet_watermark_tpu.models.lama import create_lama, init_lama

    model = create_lama("lama", dtype=jnp.float32)
    variables = init_lama(model, img_size=64)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    mask = jnp.zeros((2, 64, 64, 1), jnp.float32).at[:, 20:40, 20:40].set(1.0)
    out = model.apply(variables, img, mask, train=False)
    out = np.asarray(out)
    assert out.shape == (2, 64, 64, 3)
    assert np.isfinite(out).all()
    # known region passes through exactly
    known = np.asarray(mask[..., 0]) < 0.5
    np.testing.assert_allclose(out[known], np.asarray(img)[known], atol=1e-5)


def test_resolve_inpaint_weights_precedence(tmp_path, monkeypatch):
    from unet_watermark_tpu.configs import get_cfg_defaults
    from unet_watermark_tpu.inference.engines import resolve_inpaint_weights

    monkeypatch.delenv("PREDICT_INPAINT_WEIGHTS", raising=False)
    cfg = get_cfg_defaults()
    # explicit beats config beats env beats default
    cfg.PREDICT.INPAINT_WEIGHTS = "/cfg/path"
    monkeypatch.setenv("PREDICT_INPAINT_WEIGHTS", "/env/path")
    assert resolve_inpaint_weights("/explicit", cfg) == "/explicit"
    assert resolve_inpaint_weights(None, cfg) == "/cfg/path"
    cfg.PREDICT.INPAINT_WEIGHTS = None
    assert resolve_inpaint_weights(None, cfg) == "/env/path"


def test_inpaint_quality_tool(tmp_path):
    """PSNR/SSIM engine comparison runs end to end (pushpull engine)."""
    import cv2

    from unet_watermark_tpu.scripts.inpaint_quality import evaluate_engines

    cd = tmp_path / "clean"
    cd.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(cd / f"c{i}.png"),
                    (rng.random((80, 80, 3)) * 255).astype(np.uint8))
    r = evaluate_engines(str(cd), ["pushpull"], img_size=64, batch_size=2,
                         limit=4)
    assert r["pushpull"]["hole_psnr_db"] > 0
    assert 0 < r["pushpull"]["ssim"] <= 1


def test_psnr_ssim_metrics():
    from unet_watermark_tpu.ops import metrics as metrics_lib

    rng = np.random.default_rng(0)
    a = rng.random((2, 64, 64, 3)).astype(np.float32)
    assert float(metrics_lib.psnr(a, a)) > 80
    assert float(metrics_lib.ssim(a, a)) > 0.999
    b = np.clip(a + rng.normal(0, 0.2, a.shape), 0, 1).astype(np.float32)
    p = float(metrics_lib.psnr(b, a))
    assert 8 < p < 20
    s = float(metrics_lib.ssim(b, a))
    assert s < 0.9
    # masked psnr: error only outside the mask -> high masked psnr
    m = np.zeros((2, 64, 64, 1), np.float32)
    m[:, :8, :8] = 1
    c = a.copy()
    c[:, 32:, 32:] += 0.5
    assert float(metrics_lib.psnr(np.clip(c, 0, 1), a, mask=m)) > 40


def test_device_clean_sampler(tmp_path):
    """Uniform corpus -> jitted on-device crops; mixed shapes -> None."""
    import cv2

    from unet_watermark_tpu.training.train_inpaint import (
        device_clean_sampler,
    )

    d = tmp_path / "clean"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        cv2.imwrite(str(d / f"c{i}.png"),
                    rng.integers(0, 255, (48, 48, 3), np.uint8))
    sample, n = device_clean_sampler(str(d), batch=4, size=32, seed=0)
    assert n == 3
    out = np.asarray(sample(jax.random.PRNGKey(0)))
    assert out.shape == (4, 32, 32, 3)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    out2 = np.asarray(sample(jax.random.PRNGKey(1)))
    assert not np.array_equal(out, out2)

    cv2.imwrite(str(d / "odd.png"),
                rng.integers(0, 255, (64, 48, 3), np.uint8))
    assert device_clean_sampler(str(d), batch=4, size=32) is None
