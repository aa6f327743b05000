import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unet_watermark_tpu.ops import augment as aug


def _batch(n=4, s=32, seed=0):
    rng = np.random.default_rng(seed)
    imgs = jnp.asarray(rng.random((n, s, s, 3)), jnp.float32)
    masks = jnp.zeros((n, s, s, 1), jnp.float32).at[:, 8:24, 8:24].set(1.0)
    return imgs, masks


@pytest.mark.parametrize("policy", list(aug.POLICIES))
def test_policies_produce_valid_outputs(policy):
    imgs, masks = _batch()
    key = jax.random.PRNGKey(0)
    out_i, out_m = aug.augment_batch(key, imgs, masks, policy,
                                     apply_normalize=False)
    assert out_i.shape == imgs.shape and out_m.shape == masks.shape
    oi, om = np.asarray(out_i), np.asarray(out_m)
    assert np.isfinite(oi).all()
    assert oi.min() >= -1e-5 and oi.max() <= 1 + 1e-5
    assert set(np.unique(om)).issubset({0.0, 1.0})  # masks stay binary


def test_geometry_applied_to_mask_and_image_together():
    """If the image flipped, the mask must flip with it."""
    imgs, masks = _batch(n=16)
    # mark a corner to detect flips
    imgs = imgs.at[:, :4, :4, :].set(1.0)
    masks = jnp.zeros_like(masks).at[:, :4, :4, :].set(1.0)
    key = jax.random.PRNGKey(3)
    out_i, out_m = aug.augment_batch(key, imgs, masks, "basic",
                                     apply_normalize=False)
    oi, om = np.asarray(out_i), np.asarray(out_m)
    for i in range(16):
        # wherever the mask is 1, the image should be (near) 1 too —
        # geometric transforms moved them identically (photometric ops
        # shift intensity, so just require above-median brightness)
        sel = om[i, :, :, 0] > 0.5
        if sel.sum() == 0:
            continue
        assert oi[i][sel].mean() > oi[i].mean()


def test_deterministic_given_key():
    imgs, masks = _batch()
    key = jax.random.PRNGKey(42)
    a = aug.augment_batch(key, imgs, masks, "transparent_watermark")
    b = aug.augment_batch(key, imgs, masks, "transparent_watermark")
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = aug.augment_batch(jax.random.PRNGKey(43), imgs, masks,
                          "transparent_watermark")
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_normalize_matches_imagenet():
    imgs = jnp.ones((1, 4, 4, 3), jnp.float32) * 0.5
    out = aug.normalize(imgs)
    expected = (0.5 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], expected, rtol=1e-5)
    back = aug.denormalize(out)
    np.testing.assert_allclose(np.asarray(back), 0.5, atol=1e-6)


def test_augment_is_jittable():
    imgs, masks = _batch()
    f = jax.jit(lambda k, i, m: aug.augment_batch(k, i, m, "enhanced"))
    out_i, out_m = f(jax.random.PRNGKey(0), imgs, masks)
    assert np.isfinite(np.asarray(out_i)).all()


def test_jpeg_compression_sim():
    """Low quality adds block artifacts; high quality is near-identity."""
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.random((32, 32, 3)), jnp.float32)
    hi = np.asarray(aug.jpeg_compression_sim(img, jnp.float32(98.0)))
    lo = np.asarray(aug.jpeg_compression_sim(img, jnp.float32(8.0)))
    err_hi = np.abs(hi - np.asarray(img)).mean()
    err_lo = np.abs(lo - np.asarray(img)).mean()
    assert err_hi < 0.035, err_hi
    assert err_lo > err_hi * 2
    assert hi.min() >= 0 and hi.max() <= 1


def test_jpeg_against_real_codec():
    """Quality ordering must match a real JPEG encoder on a natural-ish
    image (the sim omits chroma subsampling, so magnitudes differ; the
    quality→artifact monotonicity is the contract)."""
    import cv2

    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32) / 64
    img = np.stack([ys, xs, (ys + xs) / 2], -1)
    img[20:40, 20:40] = [0.9, 0.2, 0.1]
    img_u8 = (img * 255).astype(np.uint8)
    errs_real, errs_ours = [], []
    for q in (10, 50, 90):
        ok, enc = cv2.imencode(".jpg", img_u8,
                               [cv2.IMWRITE_JPEG_QUALITY, q])
        real = cv2.imdecode(enc, cv2.IMREAD_COLOR).astype(np.float32) / 255
        ours = np.asarray(aug.jpeg_compression_sim(
            jnp.asarray(img), jnp.float32(q)))
        errs_real.append(np.abs(real - img).mean())
        errs_ours.append(np.abs(ours - img).mean())
    assert errs_real[0] > errs_real[1] > errs_real[2]
    assert errs_ours[0] > errs_ours[1] > errs_ours[2]
    assert errs_ours[0] > 0.005  # q=10 produces visible artifacts


def test_rot90_fold_is_exact_rot90():
    """The rot90-folded warp (nearest sampling at exact 90° multiples
    about the (N-1)/2 center) must be BIT-exact rot90. Grid convention
    mirrors direction: +90·k degrees == jnp.rot90(x, k=(4-k)%4)."""
    x = jnp.asarray(np.random.default_rng(5).random((16, 16, 3)),
                    jnp.float32)
    for k in (1, 2, 3):
        sy, sx = aug._affine_grid(16, 16, jnp.float32(1.0),
                                  jnp.float32(90.0 * k), jnp.float32(0.0),
                                  jnp.zeros(2))
        out = np.asarray(aug._nearest_sample(x, sy, sx))
        assert np.array_equal(out, np.rot90(np.asarray(x), k=(4 - k) % 4)), k


def test_nearest_sampling_creates_no_new_values():
    """Nearest interpolation must only permute existing pixels (mask
    binarity depends on this); bilinear is allowed to blend."""
    x = jnp.asarray(
        np.random.default_rng(7).integers(0, 5, (12, 12, 1)), jnp.float32)
    sy, sx = aug._affine_grid(12, 12, jnp.float32(1.1), jnp.float32(33.0),
                              jnp.float32(5.0), jnp.asarray([0.05, -0.03]))
    near = np.asarray(aug._nearest_sample(x, sy, sx))
    assert set(np.unique(near)).issubset(set(np.unique(np.asarray(x))))
    bil = np.asarray(aug._bilinear_sample(x, sy, sx))
    assert not set(np.unique(bil)).issubset(set(np.unique(np.asarray(x))))


def test_rot90_probability_semantics():
    """Documented round-2 semantics: k is drawn from {1,2,3}, so when
    rot90 fires the image always actually rotates — a firing rot90 with
    rot90_p=1 must never return the identity for an asymmetric image."""
    import dataclasses

    policy = dataclasses.replace(
        aug.POLICIES["basic"], hflip_p=0.0, vflip_p=0.0, rot90_p=1.0,
        affine_p=0.0, bc_p=0.0, noise_p=0.0, blur_p=0.0,
        jpeg_p=0.0, hsv_p=0.0, gamma_p=0.0)
    img = jnp.zeros((8, 8, 3), jnp.float32).at[0, :, :].set(1.0)
    mask = jnp.zeros((8, 8, 1), jnp.float32).at[0, :, :].set(1.0)
    for seed in range(8):
        key = jax.random.PRNGKey(seed)
        oi, om = aug.augment_batch(key, img[None], mask[None], policy,
                                   apply_normalize=False)
        assert not np.array_equal(np.asarray(oi[0]), np.asarray(img)), seed
        # image and mask rotate together
        assert np.array_equal(np.asarray(oi[0, ..., 0]),
                              np.asarray(om[0, ..., 0])), seed


def test_separable_warp_matches_gather_warp():
    """The matmul+roll warp must agree with the exact flat-gather warp
    up to its documented ≤1 px split-round slack: on a smooth image the
    values are close everywhere; on random pixels only a small fraction
    of sites may land on a neighboring pixel."""
    rng = np.random.default_rng(11)
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32) / 64
    smooth = jnp.asarray(np.stack([ys, xs, ys * xs], -1))
    for seed in range(6):
        r = np.random.default_rng(seed)
        scale = jnp.float32(1.0 + r.uniform(-0.1, 0.1))
        angle = jnp.float32(r.uniform(-15, 15) + 90 * r.integers(0, 4))
        shear = jnp.float32(r.uniform(-5, 5))
        shift = jnp.asarray(r.uniform(-0.1, 0.1, 2), jnp.float32)
        coeffs = aug._affine_coeffs(64, 64, scale, angle, shear, shift)
        sep = np.asarray(aug._separable_nearest_warp(smooth, *coeffs))
        sy, sx = aug._affine_grid(64, 64, scale, angle, shear, shift)
        gat = np.asarray(aug._nearest_sample(smooth, sy, sx))
        # smooth image: 1px index slack => value error <~ 2*gradient.
        # The slack fires on up to ~half the sites (each lands on a
        # 1-px neighbor); the value bound is the real contract.
        assert np.abs(sep - gat).max() < 0.07, seed
        assert (np.abs(sep - gat) > 1e-6).mean() < 0.6, seed


def test_separable_warp_exact_rot90_and_identity():
    x = jnp.asarray(np.random.default_rng(5).random((16, 16, 3)),
                    jnp.float32)
    zero = jnp.float32(0.0)
    one = jnp.float32(1.0)
    for k in (0, 1, 2, 3):
        coeffs = aug._affine_coeffs(16, 16, one, jnp.float32(90.0 * k),
                                    zero, jnp.zeros(2))
        out = np.asarray(aug._separable_nearest_warp(x, *coeffs))
        assert np.array_equal(out, np.rot90(np.asarray(x), k=(4 - k) % 4)), k


def test_separable_warp_creates_no_new_values():
    x = jnp.asarray(
        np.random.default_rng(7).integers(0, 5, (12, 12, 1)), jnp.float32)
    coeffs = aug._affine_coeffs(12, 12, jnp.float32(1.1), jnp.float32(33.0),
                                jnp.float32(5.0),
                                jnp.asarray([0.05, -0.03], jnp.float32))
    sep = np.asarray(aug._separable_nearest_warp(x, *coeffs))
    assert set(np.unique(sep)).issubset(set(np.unique(np.asarray(x))))


def test_separable_warp_nonsquare():
    """h != w disables the transpose-select path but must still warp."""
    ys, xs = np.mgrid[0:32, 0:48].astype(np.float32)
    img = jnp.asarray(np.stack([ys / 32, xs / 48, ys * 0], -1))
    coeffs = aug._affine_coeffs(32, 48, jnp.float32(1.05), jnp.float32(8.0),
                                jnp.float32(0.0), jnp.zeros(2))
    sep = np.asarray(aug._separable_nearest_warp(img, *coeffs))
    sy, sx = aug._affine_grid(32, 48, jnp.float32(1.05), jnp.float32(8.0),
                              jnp.float32(0.0), jnp.zeros(2))
    gat = np.asarray(aug._nearest_sample(img, sy, sx))
    assert np.abs(sep - gat).max() < 0.12


def test_roll_by_lines():
    x = jnp.asarray(np.arange(20, dtype=np.float32).reshape(4, 5))
    shift = jnp.asarray([0, 1, 2, 7])  # per row, rolled along columns
    out = np.asarray(aug._roll_by_lines(x, shift, axis=1, line_axis=0))
    ref = np.stack([np.roll(np.asarray(x)[i], -int(shift[i]))
                    for i in range(4)])
    np.testing.assert_array_equal(out, ref)
