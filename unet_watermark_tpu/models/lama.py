"""LaMa-style FFC inpainting network (Suvorov et al. 2022, WACV).

TPU-native reimplementation of the learned inpainting engine the reference
reaches through iopaint's LaMa (/root/reference/src/predict.py:771-777,
SURVEY.md §7.1 layer 7). Fast Fourier Convolutions give a global receptive
field in every block; the spectral transform here is a dense DFT expressed
as MXU matmuls (see dft2) — tiny at the /8 working resolution and portable
to TPU runtimes whose FFT custom-call is unimplemented.

Architecture (big-lama generator):
  input  = image(3) ⊕ hole-mask(1), holes zeroed
  stem   = 7x7 conv → 64ch
  down   = 3 stride-2 convs → 512ch at /8
  body   = N FFC residual blocks (local 3x3 branch + global spectral branch)
  up     = 3 transposed convs → 64ch at /1
  head   = 7x7 conv → 3ch, sigmoid; composited: out*mask + image*(1-mask)

bf16 for convs, fp32 for the FFT path (spectral precision matters).
Weights train from scratch via training/train_inpaint.py. Users who have
the public big-lama torch checkpoint (the file the reference's iopaint
downloads at runtime) can import it instead: point
PREDICT_INPAINT_WEIGHTS at the .ckpt/.pt and the engine registry routes
it through models/lama_import.py's faithful-structure generator.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


import functools


@functools.lru_cache(maxsize=16)
def _dft_matrices(n: int):
    """(cos, sin) of the orthonormal DFT matrix for length n.

    Returns NUMPY arrays: an lru_cache of jnp values would cache tracers
    when first invoked inside a jit trace (UnexpectedTracerError on the
    next trace)."""
    import numpy as np

    k = np.arange(n)[:, None]
    t = np.arange(n)[None, :]
    ang = -2.0 * np.pi * k * t / n
    scale = 1.0 / np.sqrt(n)
    return (np.asarray(np.cos(ang) * scale, np.float32),
            np.asarray(np.sin(ang) * scale, np.float32))


def dft2(x: jax.Array):
    """Orthonormal 2D DFT over axes (1, 2) of a real NHWC array, computed
    as matmuls on the MXU.

    This replaces jnp.fft.rfft2: FFT custom-calls are UNIMPLEMENTED on
    some TPU runtimes (including this image's backend), and at the FFC's
    /8 working resolution the dense DFT is a pair of tiny matmuls — an
    MXU-native spectral transform rather than a scalar FFT kernel.
    Returns (real, imag).
    """
    h, w = x.shape[1], x.shape[2]
    ch, sh = _dft_matrices(h)
    cw, sw = _dft_matrices(w)
    x = x.astype(jnp.float32)
    ar = jnp.einsum("hk,nkwc->nhwc", ch, x)
    ai = jnp.einsum("hk,nkwc->nhwc", sh, x)
    br = jnp.einsum("wk,nhkc->nhwc", cw, ar) - \
        jnp.einsum("wk,nhkc->nhwc", sw, ai)
    bi = jnp.einsum("wk,nhkc->nhwc", sw, ar) + \
        jnp.einsum("wk,nhkc->nhwc", cw, ai)
    return br, bi


def idft2_real(real: jax.Array, imag: jax.Array):
    """Real part of the orthonormal inverse 2D DFT (matmul form)."""
    h, w = real.shape[1], real.shape[2]
    ch, sh = _dft_matrices(h)
    cw, sw = _dft_matrices(w)
    # inverse DFT = conjugate transform: cos, +sin
    ar = jnp.einsum("hk,nkwc->nhwc", ch.T, real) - \
        jnp.einsum("hk,nkwc->nhwc", (-sh).T, imag)
    ai = jnp.einsum("hk,nkwc->nhwc", (-sh).T, real) + \
        jnp.einsum("hk,nkwc->nhwc", ch.T, imag)
    out = jnp.einsum("wk,nhkc->nhwc", cw.T, ar) - \
        jnp.einsum("wk,nhkc->nhwc", (-sw).T, ai)
    return out


class SpectralTransform(nn.Module):
    """Global branch: DFT (matmul) → 1x1 conv on stacked (real, imag) →
    inverse DFT. Spectral math stays fp32; convs run in the model dtype."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        y = nn.Conv(self.channels // 2, (1, 1), use_bias=False,
                    dtype=self.dtype, name="reduce")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="reduce_bn")(y)
        y = nn.relu(y)

        fr_r, fr_i = dft2(y.astype(jnp.float32))
        fr = jnp.concatenate([fr_r, fr_i], axis=-1).astype(self.dtype)
        fr = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                     name="fourier_conv")(fr)
        fr = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype,
                          name="fourier_bn")(fr)
        fr = nn.relu(fr).astype(jnp.float32)
        half = fr.shape[-1] // 2
        y2 = idft2_real(fr[..., :half], fr[..., half:])
        y2 = y2.astype(self.dtype)

        out = nn.Conv(self.channels, (1, 1), use_bias=False,
                      dtype=self.dtype, name="project")(y2)
        return out


class FFC(nn.Module):
    """Fast Fourier Convolution: local/global split with cross terms."""

    channels: int
    ratio_g: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        cg = int(self.channels * self.ratio_g)
        cl = self.channels - cg
        conv = lambda ch, name: nn.Conv(
            ch, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name=name)
        # local→local, global→local: ordinary 3x3
        out_l = conv(cl, "l2l")(x_l)
        if x_g is not None:
            out_l = out_l + conv(cl, "g2l")(x_g)
        # local→global 3x3; global→global spectral
        out_g = conv(cg, "l2g")(x_l)
        if x_g is not None:
            out_g = out_g + SpectralTransform(
                cg, dtype=self.dtype, name="g2g")(x_g, train)
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        return nn.relu(bn("bn_l")(out_l)), nn.relu(bn("bn_g")(out_g))


class FFCResBlock(nn.Module):
    channels: int
    ratio_g: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x_l, x_g, train: bool = False):
        idl, idg = x_l, x_g
        x_l, x_g = FFC(self.channels, self.ratio_g, dtype=self.dtype,
                       name="ffc1")(x_l, x_g, train)
        x_l, x_g = FFC(self.channels, self.ratio_g, dtype=self.dtype,
                       name="ffc2")(x_l, x_g, train)
        return x_l + idl, x_g + idg


class LamaGenerator(nn.Module):
    base_channels: int = 64
    num_blocks: int = 9
    ratio_g: float = 0.5
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, image, mask, train: bool = False):
        """image (N,H,W,3) [0,1]; mask (N,H,W,1), 1 = hole. Returns the
        composited inpainted image (known pixels passed through)."""
        masked = image * (1.0 - mask)
        x = jnp.concatenate([masked, mask], axis=-1).astype(self.dtype)

        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        # stem: reflect-pad 7x7
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(self.base_channels, (7, 7), padding="VALID",
                    use_bias=False, dtype=self.dtype, name="stem")(x)
        x = nn.relu(bn("stem_bn")(x))
        # downsample x3: 64→128→256→512 at /8
        ch = self.base_channels
        for i in range(3):
            ch *= 2
            x = nn.Conv(ch, (3, 3), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], use_bias=False,
                        dtype=self.dtype, name=f"down{i}")(x)
            x = nn.relu(bn(f"down{i}_bn")(x))

        cg = int(ch * self.ratio_g)
        cl = ch - cg
        x_l, x_g = x[..., :cl], x[..., cl:]
        for i in range(self.num_blocks):
            x_l, x_g = FFCResBlock(ch, self.ratio_g, dtype=self.dtype,
                                   name=f"block{i}")(x_l, x_g, train)
        x = jnp.concatenate([x_l, x_g], axis=-1)

        for i in range(3):
            ch //= 2
            x = nn.ConvTranspose(ch, (4, 4), strides=(2, 2), padding="SAME",
                                 use_bias=False, dtype=self.dtype,
                                 name=f"up{i}")(x)
            x = nn.relu(bn(f"up{i}_bn")(x))

        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(3, (7, 7), padding="VALID", dtype=self.dtype,
                    name="head")(x)
        out = nn.sigmoid(x.astype(jnp.float32))
        return out * mask + image * (1.0 - mask)


class LamaDiscriminator(nn.Module):
    """PatchGAN discriminator (pix2pix NLayerDiscriminator shape, the one
    LaMa trains against). Returns (patch logits, feature maps) — features
    feed the feature-matching loss. InstanceNorm (GroupNorm with one group
    per channel) keeps it stateless, so the GAN train step carries no
    discriminator batch stats."""

    base: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        y = x.astype(self.dtype)
        feats = []
        for i, ch in enumerate((self.base, self.base * 2, self.base * 4,
                                self.base * 8)):
            stride = (2, 2) if i < 3 else (1, 1)
            y = nn.Conv(ch, (4, 4), strides=stride,
                        padding=[(1, 1), (1, 1)], dtype=self.dtype,
                        name=f"conv{i}")(y)
            if i > 0:
                y = nn.GroupNorm(num_groups=None, group_size=1,
                                 dtype=self.dtype, name=f"norm{i}")(y)
            y = nn.leaky_relu(y, 0.2)
            feats.append(y)
        logits = nn.Conv(1, (4, 4), padding=[(1, 1), (1, 1)],
                         dtype=self.dtype, name="head")(y)
        return logits.astype(jnp.float32), feats


def create_lama(variant: str = "lama", dtype: Dtype = jnp.bfloat16
                ) -> LamaGenerator:
    """Factory. 'lama' = 9 FFC blocks; 'big-lama' = 18; 'mat' maps to
    big-lama (the reference's text-repair engine choice is a quality knob,
    predict.py:978)."""
    variants = {"lama": 9, "big-lama": 18, "mat": 18}
    if variant not in variants:
        raise ValueError(f"unknown inpaint model '{variant}'")
    return LamaGenerator(num_blocks=variants[variant], dtype=dtype)


def init_lama(model: LamaGenerator, img_size: int = 256, seed: int = 0):
    rng = jax.random.PRNGKey(seed)
    img = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    msk = jnp.zeros((1, img_size, img_size, 1), jnp.float32)
    return model.init(rng, img, msk, train=False)
