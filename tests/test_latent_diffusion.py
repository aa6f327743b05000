"""Native latent-diffusion inpainting: train → sample → backend fallback."""
import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture(scope="module")
def clean_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("clean")
    rng = np.random.default_rng(0)
    for i in range(4):
        img = np.zeros((96, 96, 3), np.uint8)
        img[:] = rng.integers(0, 255, 3)
        cv2.circle(img, (48, 48), 20, tuple(int(v) for v in
                                            rng.integers(0, 255, 3)), -1)
        cv2.imwrite(str(d / f"c{i}.png"), img)
    return str(d)


@pytest.fixture(scope="module")
def trained_ckpt(clean_dir, tmp_path_factory):
    from unet_watermark_tpu.training.train_latent_diffusion import (
        train_latent_diffusion,
    )

    out = str(tmp_path_factory.mktemp("ld") / "ckpt")
    r = train_latent_diffusion(clean_dir, out, img_size=64, batch_size=2,
                               ae_steps=4, dn_steps=4, log_every=2)
    return r["checkpoint"]


def test_schedule_monotone():
    from unet_watermark_tpu.diffusion.latent_diffusion import alpha_bars

    ab = alpha_bars()
    assert ab[0] == 1.0
    assert np.all(np.diff(ab) <= 1e-9)
    assert ab[-1] < 0.01


def test_train_and_inpaint(trained_ckpt):
    from unet_watermark_tpu.diffusion.latent_diffusion import LatentInpainter

    inp = LatentInpainter(weights_path=trained_ckpt)
    rng = np.random.default_rng(1)
    images = rng.random((2, 64, 64, 3)).astype(np.float32)
    masks = np.zeros((2, 64, 64, 1), np.float32)
    masks[:, 16:48, 16:48] = 1.0
    out = inp.inpaint(images, masks, steps=4)
    assert out.shape == images.shape
    assert np.isfinite(out).all()
    # known region passes through exactly
    known = masks[..., 0] == 0
    np.testing.assert_allclose(out[known], images[known], atol=1e-5)
    # hole region was actually generated (different from input)
    assert np.abs(out[~known] - images[~known]).mean() > 1e-3


def test_sd3_fallback_uses_native_diffusion(trained_ckpt, monkeypatch):
    import unet_watermark_tpu.diffusion.latent_diffusion as ld
    from unet_watermark_tpu.diffusion.sd3_inpaint import SDWatermarkRemover

    monkeypatch.setenv("DIFFUSION_WEIGHTS", trained_ckpt)
    monkeypatch.setattr(ld, "_singleton", None)
    monkeypatch.setattr(ld, "_singleton_failed", False)
    remover = SDWatermarkRemover(steps=3)
    img = np.full((80, 70, 3), 120, np.uint8)
    mask = np.zeros((80, 70), np.uint8)
    mask[20:40, 20:50] = 255
    out = remover.remove_watermark_with_mask(img, mask)
    assert out.shape == img.shape
    # the hole was filled by the generative engine (not a copy)
    assert (out[20:40, 20:50] != img[20:40, 20:50]).any()
    assert ld.get_inpainter() is not None


def test_diffusion_engine_in_registry(trained_ckpt, monkeypatch):
    """get_engine('diffusion') serves the native latent-diffusion engine
    (same (images, masks) -> images contract as lama/pushpull), so the
    quality tooling and repair pipeline can dispatch to it by name."""
    from unet_watermark_tpu.inference.engines import get_engine

    engine = get_engine("diffusion", weights_path=trained_ckpt)
    rng = np.random.default_rng(3)
    images = jnp.asarray(rng.random((2, 64, 64, 3)), jnp.float32)
    masks = np.zeros((2, 64, 64, 1), np.float32)
    masks[:, 16:48, 16:48] = 1.0
    out = np.asarray(engine(images, jnp.asarray(masks)))
    assert out.shape == images.shape
    known = masks[..., 0] == 0
    np.testing.assert_allclose(out[known], np.asarray(images)[known],
                               atol=1e-5)

    # no weights anywhere -> pushpull fallback, not an exception
    monkeypatch.delenv("DIFFUSION_WEIGHTS", raising=False)
    fallback = get_engine("diffusion",
                          weights_path="/nonexistent/ld.npz")
    out2 = np.asarray(fallback(images, jnp.asarray(masks)))
    assert out2.shape == images.shape


def test_ship_weights_roundtrip(trained_ckpt, tmp_path, monkeypatch):
    """ship_weights writes the bf16 npz the registry resolves and the
    LatentInpainter loads."""
    from unet_watermark_tpu.diffusion.latent_diffusion import LatentInpainter
    from unet_watermark_tpu.training.train_latent_diffusion import (
        ship_weights,
    )
    import orbax.checkpoint as ocp

    params = ocp.StandardCheckpointer().restore(trained_ckpt)
    dest = str(tmp_path / "latent_diffusion.npz")
    ship_weights(params, dest)
    inp = LatentInpainter(weights_path=dest)
    rng = np.random.default_rng(4)
    images = rng.random((1, 64, 64, 3)).astype(np.float32)
    masks = np.zeros((1, 64, 64, 1), np.float32)
    masks[:, 20:40, 20:40] = 1.0
    out = inp.inpaint(images, masks, steps=3)
    assert np.isfinite(out).all()


def test_flux_fallback_uses_native_diffusion(trained_ckpt, monkeypatch):
    import unet_watermark_tpu.diffusion.latent_diffusion as ld
    from unet_watermark_tpu.diffusion.flux_process import FluxProcessor

    monkeypatch.setenv("DIFFUSION_WEIGHTS", trained_ckpt)
    monkeypatch.setattr(ld, "_singleton", None)
    monkeypatch.setattr(ld, "_singleton_failed", False)
    fp = FluxProcessor()
    img = np.full((64, 64, 3), 90, np.uint8)
    mask = np.zeros((64, 64), np.uint8)
    mask[10:30, 10:30] = 255
    out = fp._fallback(img, mask)
    assert out.shape == img.shape
    assert (out[10:30, 10:30] != img[10:30, 10:30]).any()
