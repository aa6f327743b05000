"""On-device, batched data augmentation.

TPU-first redesign of the reference's albumentations policies
(/root/reference/src/utils/dataset.py:298-395). Instead of per-sample CPU
transforms inside DataLoader workers, augmentation runs as one vmapped,
jitted function fused into the train step: uint8-normalized images land in
HBM once, and flips/rot90/affine/color-jitter/noise/blur happen on the VPU
at memory-bandwidth speed.

Policies (matching the reference's names and parameter envelopes):
  * "basic"                 — dataset.py:375-388
  * "enhanced"              — dataset.py:336-374 (adds gamma, stronger jitter)
  * "transparent_watermark" — dataset.py:298-334 (strong brightness/contrast,
                              HSV, noise, blur; the default policy)
  * "text_watermark"        — transparent preset with gentler geometry (text
                              masks are thin; large shears destroy them)

Geometry ops are applied identically to image and mask; photometric ops to
the image only, mirroring albumentations' additional_targets semantics.
All randomness comes from a jax PRNG key — bitwise reproducible across
hosts and restores.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


@dataclasses.dataclass(frozen=True)
class AugmentPolicy:
    hflip_p: float = 0.5
    vflip_p: float = 0.2
    rot90_p: float = 0.3
    affine_p: float = 0.3
    scale_limit: float = 0.1
    rotate_limit: float = 15.0   # degrees
    shear_limit: float = 0.0     # degrees
    shift_limit: float = 0.1     # fraction of size
    brightness_limit: float = 0.2
    contrast_limit: float = 0.2
    bc_p: float = 0.3
    hue_limit: float = 10.0      # degrees of hue shift (albumentations units)
    sat_limit: float = 20.0      # 0-255 scale shift
    val_limit: float = 10.0
    hsv_p: float = 0.3
    noise_p: float = 0.0
    noise_std: float = 0.03      # on [0,1] scale (~ var_limit 30 on 0-255)
    blur_p: float = 0.0
    gamma_p: float = 0.0
    gamma_limit: Tuple[float, float] = (0.8, 1.2)
    jpeg_p: float = 0.0
    jpeg_quality: Tuple[float, float] = (60.0, 100.0)
    # "nearest" (default): gather-free separable matmul+roll warp, ~20x
    # cheaper on TPU (see _separable_nearest_warp); "nearest_gather": the
    # flat-gather warp (exact 2-D nearest, for A/B checks); "bilinear":
    # opt-in sub-pixel fidelity at 4-gather cost
    interpolation: str = "nearest"


POLICIES = {
    "basic": AugmentPolicy(),
    "enhanced": AugmentPolicy(
        brightness_limit=0.25, contrast_limit=0.25, bc_p=0.6,
        hue_limit=12, sat_limit=25, val_limit=15, hsv_p=0.4,
        noise_p=0.2, noise_std=0.02, blur_p=0.15, gamma_p=0.3),
    "transparent_watermark": AugmentPolicy(
        affine_p=0.3, scale_limit=0.1, rotate_limit=15, shear_limit=5,
        shift_limit=0.0,
        brightness_limit=0.3, contrast_limit=0.3, bc_p=0.7,
        hue_limit=15, sat_limit=30, val_limit=20, hsv_p=0.5,
        noise_p=0.3, noise_std=0.03, blur_p=0.2,
        jpeg_p=0.3, jpeg_quality=(60.0, 100.0)),
    "text_watermark": AugmentPolicy(
        affine_p=0.2, scale_limit=0.05, rotate_limit=8, shear_limit=2,
        shift_limit=0.0,
        brightness_limit=0.3, contrast_limit=0.3, bc_p=0.7,
        hue_limit=15, sat_limit=30, val_limit=20, hsv_p=0.5,
        noise_p=0.3, noise_std=0.03, blur_p=0.1),
}


# ---------------------------------------------------------------------------
# geometry (image + mask)
# ---------------------------------------------------------------------------

def _affine_grid(h: int, w: int, scale, angle_deg, shear_deg, shift_xy):
    """Inverse-map sampling grid for a center affine transform."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ang = jnp.deg2rad(angle_deg)
    shr = jnp.deg2rad(shear_deg)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    # forward: scale → shear(x) → rotate; we need the inverse map
    m00 = scale * cos
    m01 = scale * (cos * jnp.tan(shr) - sin)
    m10 = scale * sin
    m11 = scale * (sin * jnp.tan(shr) + cos)
    det = m00 * m11 - m01 * m10
    i00, i01 = m11 / det, -m01 / det
    i10, i11 = -m10 / det, m00 / det
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ty, tx = shift_xy[1] * h, shift_xy[0] * w
    yy = ys - cy - ty
    xx = xs - cx - tx
    src_x = i00 * xx + i01 * yy + cx
    src_y = i10 * xx + i11 * yy + cy
    return src_y, src_x


def _affine_coeffs(h: int, w: int, scale, angle_deg, shear_deg, shift_xy):
    """Same inverse map as `_affine_grid`, as linear coefficients:
    src_x = p·xo + q·yo + rx,  src_y = s·xo + t·yo + ry
    (xo = output column, yo = output row)."""
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    ang = jnp.deg2rad(angle_deg)
    shr = jnp.deg2rad(shear_deg)
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    m00 = scale * cos
    m01 = scale * (cos * jnp.tan(shr) - sin)
    m10 = scale * sin
    m11 = scale * (sin * jnp.tan(shr) + cos)
    det = m00 * m11 - m01 * m10
    i00, i01 = m11 / det, -m01 / det
    i10, i11 = -m10 / det, m00 / det
    ty, tx = shift_xy[1] * h, shift_xy[0] * w
    p, q = i00, i01
    rx = cx - i00 * (cx + tx) - i01 * (cy + ty)
    s, t = i10, i11
    ry = cy - i10 * (cx + tx) - i11 * (cy + ty)
    return p, q, rx, s, t, ry


def _roll_by_lines(x: Array, shift: Array, axis: int, line_axis: int
                   ) -> Array:
    """Roll `x` along `axis` by a per-line amount (`shift` indexed by the
    position along `line_axis`): out[.., i, ..] = x[.., (i+shift) mod n, ..].

    A data-dependent per-line shift is a gather, which TPUs run at ~2%
    lane utilization; decomposing the shift into its binary digits turns
    it into ≤⌈log2 n⌉ full-tensor rolls + selects, all of which move whole
    lanes at HBM bandwidth."""
    n = x.shape[axis]
    sh = jnp.mod(shift, n)
    cshape = [1] * x.ndim
    cshape[line_axis] = x.shape[line_axis]
    for k in range(max(1, (n - 1).bit_length())):
        bit = ((sh >> k) & 1).astype(bool).reshape(cshape)
        rolled = jnp.roll(x, -(1 << k), axis=axis)
        x = jnp.where(bit, rolled, x)
    return x


def _separable_nearest_warp(img: Array, p, q, rx, s, t, ry) -> Array:
    """Nearest-neighbor affine warp as two axis-separable passes.

    The flat-gather warp (`_nearest_sample`) measured 420 ms of the 443 ms
    augmentation step at 512²×32 (workspace/exp_aug_ablate2.log): TPU
    gathers of thin [C]-rows are ~1000× off the HBM roofline. This
    formulation keeps everything in wide-lane land:

      pass 1 (rows):  mid[yo, x] = img[A·yo + B·x + C, x]
      pass 2 (cols):  out[yo, xo] = mid[yo, p·xo + q·yo + rx]

    with each pass's index split as round(base(t)) + round(slope·line):
    the base term is a one-hot matmul on the MXU, the per-line term is
    `_roll_by_lines`. Border handling is reflect-101, done exactly by
    extending each axis with its mirrored interior (size 2N−2) so the
    mod-N wrap of rolls/one-hots IS the reflection.

    Approximations vs the exact 2-D nearest warp (all ≤1 px, irrelevant
    for augmentation): the split round can be off by one, and pass 1 is
    evaluated at the rounded pass-2 index. At exact multiples of 90°
    about the (N−1)/2 center every coefficient is an integer, both
    approximations vanish, and the warp is BIT-exact rot90 — the
    property the rot90 fold depends on. Like the gather warp, this only
    ever copies existing pixel values (each output is a one-hot·row dot
    product), so nearest warps create no new values and mask binarity
    is preserved exactly.
    """
    h, w, c = img.shape
    if h == w:
        # near-90° maps degenerate pass 2 (p→0): sample the transposed
        # image instead and swap coefficient roles (the Catmull-Smith
        # "bottleneck" fix). Guarantees |s| ≤ |p| below.
        flip = jnp.abs(s) > jnp.abs(p)
        img = jnp.where(flip, jnp.swapaxes(img, 0, 1), img)
        p, q, rx, s, t, ry = (
            jnp.where(flip, s, p), jnp.where(flip, t, q),
            jnp.where(flip, ry, rx), jnp.where(flip, p, s),
            jnp.where(flip, q, t), jnp.where(flip, rx, ry))
    p_safe = jnp.where(jnp.abs(p) < 1e-6,
                       jnp.where(p < 0, -1e-6, 1e-6), p)
    slope_b = s / p_safe
    a_coef = (p * t - q * s) / p_safe
    c_coef = ry - s * rx / p_safe

    ny = 2 * h - 2
    ext = jnp.concatenate([img, img[-2:0:-1]], axis=0)
    shift1 = jnp.round(slope_b * jnp.arange(w)).astype(jnp.int32)
    ext = _roll_by_lines(ext, shift1, axis=0, line_axis=1)
    base1 = jnp.mod(
        jnp.round(a_coef * jnp.arange(h) + c_coef).astype(jnp.int32), ny)
    onehot1 = (base1[:, None] == jnp.arange(ny)[None, :]).astype(img.dtype)
    mid = (onehot1 @ ext.reshape(ny, w * c)).reshape(h, w, c)

    nx = 2 * w - 2
    ext2 = jnp.concatenate([mid, mid[:, -2:0:-1]], axis=1)
    shift2 = jnp.round(q * jnp.arange(h)).astype(jnp.int32)
    ext2 = _roll_by_lines(ext2, shift2, axis=1, line_axis=0)
    base2 = jnp.mod(
        jnp.round(p * jnp.arange(w) + rx).astype(jnp.int32), nx)
    onehot2 = (base2[:, None] == jnp.arange(nx)[None, :]).astype(img.dtype)
    # contract the extended-x axis on the MXU: [(h·c), nx] @ [nx, w]
    tr = ext2.transpose(0, 2, 1).reshape(h * c, nx)
    return (tr @ onehot2.T).reshape(h, c, w).transpose(0, 2, 1)


def _bilinear_sample(img: Array, src_y: Array, src_x: Array) -> Array:
    """img: (H,W,C); reflect-101 border like albumentations default."""
    h, w = img.shape[0], img.shape[1]

    def reflect(v, n):
        # reflect-101 for arbitrary overshoot
        period = 2 * (n - 1)
        v = jnp.abs(v) % period
        return jnp.where(v >= n, period - v, v)

    src_y = reflect(src_y, h)
    src_x = reflect(src_x, w)
    y0 = jnp.clip(jnp.floor(src_y), 0, h - 1)
    x0 = jnp.clip(jnp.floor(src_x), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    wy = (src_y - y0)[..., None]
    wx = (src_x - x0)[..., None]
    y0i, y1i, x0i, x1i = (v.astype(jnp.int32) for v in (y0, y1, x0, x1))
    flat = img.reshape(h * w, -1)
    v00 = jnp.take(flat, y0i * w + x0i, axis=0)
    v01 = jnp.take(flat, y0i * w + x1i, axis=0)
    v10 = jnp.take(flat, y1i * w + x0i, axis=0)
    v11 = jnp.take(flat, y1i * w + x1i, axis=0)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _nearest_sample(img: Array, src_y: Array, src_x: Array) -> Array:
    """Nearest-neighbor warp: ONE gather instead of bilinear's four.
    TPU gathers of thin [C]-rows run at ~2% lane utilization, so the
    warp cost is proportional to gather count — measured 1,177 ms of a
    1,200 ms augmentation step went to the bilinear affine at 512²x32
    (workspace/exp_aug_ablate.py). Augmentation does not need sub-pixel
    fidelity; masks are thresholded anyway."""
    h, w = img.shape[0], img.shape[1]

    def reflect(v, n):
        period = 2 * (n - 1)
        v = jnp.abs(v) % period
        return jnp.where(v >= n, period - v, v)

    yi = jnp.clip(jnp.round(reflect(src_y, h)), 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.round(reflect(src_x, w)), 0, w - 1).astype(jnp.int32)
    flat = img.reshape(h * w, -1)
    return jnp.take(flat, yi * w + xi, axis=0)


def _hsv_shift(img: Array, dh: Array, ds: Array, dv: Array) -> Array:
    """HSV jitter on [0,1] RGB. dh in degrees, ds/dv on 0-255 scale."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    diff = mx - mn + 1e-8
    h = jnp.where(
        mx == r, (g - b) / diff % 6.0,
        jnp.where(mx == g, (b - r) / diff + 2.0, (r - g) / diff + 4.0))
    h = h * 60.0
    s = diff / (mx + 1e-8)
    v = mx
    h = (h + dh) % 360.0
    s = jnp.clip(s + ds / 255.0, 0.0, 1.0)
    v = jnp.clip(v + dv / 255.0, 0.0, 1.0)
    c = v * s
    hp = h / 60.0
    x = c * (1.0 - jnp.abs(hp % 2.0 - 1.0))
    z = jnp.zeros_like(c)
    i = hp.astype(jnp.int32) % 6
    r2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [c, x, z, z, x, c])
    g2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [x, c, c, x, z, z])
    b2 = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                    [z, z, x, c, c, x])
    m = v - c
    return jnp.stack([r2 + m, g2 + m, b2 + m], axis=-1)


def _blur3(img: Array) -> Array:
    """3x3 box-ish blur (stands in for Motion/GaussianBlur blur_limit=3)."""
    k = jnp.array([[1., 2., 1.], [2., 4., 2.], [1., 2., 1.]]) / 16.0
    k = k[:, :, None, None]
    x = img[None]
    c = x.shape[-1]
    kc = jnp.tile(k, (1, 1, 1, 1))
    outs = []
    for ch in range(c):
        outs.append(jax.lax.conv_general_dilated(
            x[..., ch:ch + 1], kc, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")))
    return jnp.concatenate(outs, axis=-1)[0]


@functools.lru_cache(maxsize=1)
def _dct8():
    """8-point DCT-II matrix (orthonormal), fp32.

    Returns NUMPY (not jnp): lru_cache + jnp would cache a tracer if the
    first call happens inside a jit trace, poisoning later traces with
    UnexpectedTracerError."""
    import numpy as np

    k = np.arange(8)[:, None]
    n = np.arange(8)[None, :]
    m = np.cos(np.pi * (2 * n + 1) * k / 16) * np.sqrt(2 / 8)
    m[0] /= np.sqrt(2)
    return np.asarray(m, np.float32)


# luminance quantization base table (JPEG Annex K)
_JPEG_Q = jnp.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], jnp.float32)


def jpeg_compression_sim(image: Array, quality: Array) -> Array:
    """Differentiable-free JPEG artifact simulation on device.

    The albumentations policy applies A.ImageCompression(quality 60-100)
    (dataset.py:330-332); cv2's encoder can't run on TPU, so this
    reproduces the artifact-generating core: per-channel 8x8 block DCT
    (matmuls on the MXU), quantization with the standard luminance table
    scaled by `quality`, inverse DCT. H, W must be multiples of 8 (the
    pipeline's sizes are multiples of 32). quality: scalar in [1, 100].
    """
    h, w, c = image.shape
    d = jnp.asarray(_dct8())
    scale = jnp.where(quality < 50, 5000.0 / quality,
                      200.0 - 2.0 * quality)
    q = jnp.clip(jnp.floor((_JPEG_Q * scale + 50.0) / 100.0), 1, 255)
    x = image * 255.0 - 128.0
    # (H/8, 8, W/8, 8, C) blocks
    xb = x.reshape(h // 8, 8, w // 8, 8, c)
    # DCT rows/cols: D @ block @ D^T
    f = jnp.einsum("ij,ajbkc->aibkc", d, xb)
    f = jnp.einsum("kl,ajblc->ajbkc", d, f)
    f = jnp.round(f / q[None, :, None, :, None]) * q[None, :, None, :, None]
    y = jnp.einsum("ji,ajbkc->aibkc", d, f)
    y = jnp.einsum("lk,ajblc->ajbkc", d, y)
    out = (y.reshape(h, w, c) + 128.0) / 255.0
    return jnp.clip(out, 0.0, 1.0)


def augment_sample(key: Array, image: Array, mask: Array,
                   policy: AugmentPolicy) -> Tuple[Array, Array]:
    """Augment one (H,W,3) [0,1] image + (H,W,1) mask pair."""
    keys = jax.random.split(key, 12)
    h, w = image.shape[0], image.shape[1]

    # --- geometric (image + mask together) ---
    # static `p > 0` guards keep disabled ops out of the graph entirely
    # (a policy is a static dataclass, so these are trace-time branches)
    if policy.hflip_p > 0:
        do_h = jax.random.uniform(keys[0]) < policy.hflip_p
        image = jnp.where(do_h, image[:, ::-1], image)
        mask = jnp.where(do_h, mask[:, ::-1], mask)

    if policy.vflip_p > 0:
        do_v = jax.random.uniform(keys[1]) < policy.vflip_p
        image = jnp.where(do_v, image[::-1], image)
        mask = jnp.where(do_v, mask[::-1], mask)

    # rot90 is folded into the affine warp below: R(a)·R(90k) = R(a+90k)
    # (the grid composes ...·Rot rightmost), and nearest sampling at an
    # exact multiple of 90° about the (N-1)/2 center lands on integer
    # coordinates, so the fold is bit-exact rot90. This removes the
    # 4-way rotation stack + dynamic index that dominated the augment
    # step once the warp itself was cheap (workspace/exp_aug_ablate*).
    # Sampling semantics vs the pre-fold code (intentional, round 2):
    # k is drawn from {1,2,3} so a firing rot90 always rotates —
    # effective rotation probability is rot90_p, not 0.75*rot90_p; a
    # +90° angle here equals jnp.rot90(x, k=3) (grid convention mirrors
    # direction); and when affine+rot90 both fire, shear composes before
    # the 90° rotation. All distribution-equivalent for training but not
    # bit-reproducible against pre-fold runs.
    rot90_deg = 0.0
    if h == w and policy.rot90_p > 0:
        do_r = jax.random.uniform(keys[2]) < policy.rot90_p
        k_r = jax.random.randint(keys[3], (), 1, 4)
        rot90_deg = jnp.where(do_r, 90.0 * k_r, 0.0)

    if policy.affine_p > 0 or (h == w and policy.rot90_p > 0):
        do_a = jax.random.uniform(keys[4]) < policy.affine_p
        scale = 1.0 + jax.random.uniform(keys[5], minval=-policy.scale_limit,
                                         maxval=policy.scale_limit)
        angle = jax.random.uniform(keys[6], minval=-policy.rotate_limit,
                                   maxval=policy.rotate_limit)
        shear = jax.random.uniform(keys[7], minval=-policy.shear_limit,
                                   maxval=policy.shear_limit)
        shift = jax.random.uniform(keys[8], (2,), minval=-policy.shift_limit,
                                   maxval=policy.shift_limit)
        scale = jnp.where(do_a, scale, 1.0)
        angle = jnp.where(do_a, angle, 0.0) + rot90_deg
        shear = jnp.where(do_a, shear, 0.0)
        shift = jnp.where(do_a, shift, jnp.zeros(2))
        # one warp over concat(image, mask): shares the work (mask
        # corners are identical indices), then split back
        both = jnp.concatenate([image, mask], axis=-1)
        if policy.interpolation == "nearest":
            coeffs = _affine_coeffs(h, w, scale, angle, shear, shift)
            both = _separable_nearest_warp(both, *coeffs)
        elif policy.interpolation == "nearest_gather":
            src_y, src_x = _affine_grid(h, w, scale, angle, shear, shift)
            both = _nearest_sample(both, src_y, src_x)
        else:
            src_y, src_x = _affine_grid(h, w, scale, angle, shear, shift)
            both = _bilinear_sample(both, src_y, src_x)
        image = both[..., :3]
        mask = (both[..., 3:] > 0.5).astype(jnp.float32)

    # --- photometric (image only) ---
    if policy.bc_p > 0:
        kb = jax.random.split(keys[9], 4)
        do_bc = jax.random.uniform(kb[0]) < policy.bc_p
        brightness = jax.random.uniform(kb[1],
                                        minval=-policy.brightness_limit,
                                        maxval=policy.brightness_limit)
        contrast = jax.random.uniform(kb[2], minval=-policy.contrast_limit,
                                      maxval=policy.contrast_limit)
        image = jnp.clip(
            (image + brightness * jnp.where(do_bc, 1.0, 0.0)) *
            (1.0 + contrast * jnp.where(do_bc, 1.0, 0.0)), 0, 1)

    if policy.hsv_p > 0:
        kh = jax.random.split(keys[10], 4)
        do_hsv = jax.random.uniform(kh[0]) < policy.hsv_p
        dh = jax.random.uniform(kh[1], minval=-policy.hue_limit,
                                maxval=policy.hue_limit)
        ds = jax.random.uniform(kh[2], minval=-policy.sat_limit,
                                maxval=policy.sat_limit)
        dv = jax.random.uniform(kh[3], minval=-policy.val_limit,
                                maxval=policy.val_limit)
        img_hsv = _hsv_shift(image, dh, ds, dv)
        image = jnp.where(do_hsv, img_hsv, image)

    kn = jax.random.split(keys[11], 5)
    if policy.noise_p > 0:
        do_n = jax.random.uniform(kn[0]) < policy.noise_p
        noise = jax.random.normal(kn[1], image.shape) * policy.noise_std
        image = jnp.clip(jnp.where(do_n, image + noise, image), 0, 1)
    if policy.blur_p > 0:
        do_b = jax.random.uniform(kn[2]) < policy.blur_p
        image = jnp.where(do_b, _blur3(image), image)
    if policy.jpeg_p > 0 and h % 8 == 0 and w % 8 == 0:
        do_j = jax.random.uniform(kn[3]) < policy.jpeg_p
        quality = jax.random.uniform(kn[4], minval=policy.jpeg_quality[0],
                                     maxval=policy.jpeg_quality[1])
        image = jnp.where(do_j, jpeg_compression_sim(image, quality), image)

    return image, mask


def normalize(image: Array) -> Array:
    """ImageNet normalization (albumentations A.Normalize parity)."""
    return (image - IMAGENET_MEAN) / IMAGENET_STD


def denormalize(image: Array) -> Array:
    return image * IMAGENET_STD + IMAGENET_MEAN


def augment_batch(key: Array, images: Array, masks: Array,
                  policy_name: str = "transparent_watermark",
                  apply_normalize: bool = True) -> Tuple[Array, Array]:
    """Batched augmentation: images (N,H,W,3) float[0,1], masks (N,H,W,1).
    `policy_name` may also be an AugmentPolicy instance directly."""
    policy = (POLICIES[policy_name] if isinstance(policy_name, str)
              else policy_name)
    keys = jax.random.split(key, images.shape[0])
    aug = jax.vmap(lambda k, im, mk: augment_sample(k, im, mk, policy))
    images, masks = aug(keys, images, masks)
    if apply_normalize:
        images = normalize(images)
    return images, masks


def val_preprocess(images: Array) -> Array:
    """Val-time preprocessing: normalize only (dataset.py:389-395 parity;
    host already resized)."""
    return normalize(images)
