"""Additional decoder families: FPN, Linknet, PSPNet, MAnet, PAN,
DeepLabV3, DeepLabV3Plus.

Completes the 9-architecture inventory the reference exposes through SMP
(/root/reference/src/models/unet_model.py:17-27). Implemented from the
original papers against the same 6-feature encoder contract as unet.py;
every decoder returns a full-resolution NHWC feature map for the shared
SegmentationHead.

All ops are XLA-friendly: static shapes, reshape/broadcast upsampling,
convs in bf16 on the MXU, attention done as batched matmuls.
"""
from __future__ import annotations

from typing import Any, List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from .unet import ConvBnRelu, DecoderBlock, upsample2x

Dtype = Any


def upsample_to(x: jax.Array, h: int, w: int) -> jax.Array:
    """Nearest upsample to an exact (h, w); power-of-two fast path."""
    n, xh, xw, c = x.shape
    if h == xh and w == xw:
        return x
    if h % xh == 0 and w % xw == 0:
        fh, fw = h // xh, w // xw
        y = x[:, :, None, :, None, :]
        y = jnp.broadcast_to(y, (n, xh, fh, xw, fw, c))
        return y.reshape(n, h, w, c)
    return jax.image.resize(x, (n, h, w, c), method="nearest")


# ---------------------------------------------------------------------------
# FPN (Lin et al. 2017) — semantic-FPN style segmentation head
# ---------------------------------------------------------------------------

class FPNDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        # laterals on strides 32,16,8,4
        c2, c3, c4, c5 = feats[2], feats[3], feats[4], feats[5]
        p5 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                     name="lateral5")(c5.astype(self.dtype))
        p4 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                     name="lateral4")(c4.astype(self.dtype)) + upsample2x(p5)
        p3 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                     name="lateral3")(c3.astype(self.dtype)) + upsample2x(p4)
        p2 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype,
                     name="lateral2")(c2.astype(self.dtype)) + upsample2x(p3)

        n, h, w, _ = p2.shape  # stride 4
        merged = jnp.zeros((n, h, w, self.segmentation_channels), self.dtype)
        for i, (p, ups) in enumerate(((p5, 3), (p4, 2), (p3, 1), (p2, 0))):
            y = p
            # each seg branch: (conv3x3-bn-relu, up2x) x ups, at least 1 conv
            for u in range(max(ups, 1)):
                y = ConvBnRelu(self.segmentation_channels, dtype=self.dtype,
                               name=f"seg{i}_conv{u}")(y, train)
                if u < ups:
                    y = upsample2x(y)
            merged = merged + y
        return upsample_to(merged, h * 4, w * 4)


# ---------------------------------------------------------------------------
# LinkNet (Chaurasia & Culurciello 2017)
# ---------------------------------------------------------------------------

class LinknetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        mid = max(in_ch // 4, 16)
        y = ConvBnRelu(mid, kernel=1, dtype=self.dtype, name="reduce")(x, train)
        y = upsample2x(y)
        y = ConvBnRelu(mid, kernel=3, dtype=self.dtype, name="up_conv")(y, train)
        y = ConvBnRelu(self.out_ch, kernel=1, dtype=self.dtype,
                       name="expand")(y, train)
        return y


class LinknetDecoder(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        skips = [feats[4], feats[3], feats[2], feats[1]]
        x = feats[5].astype(self.dtype)
        for i, skip in enumerate(skips):
            out_ch = skip.shape[-1]
            x = LinknetBlock(out_ch, dtype=self.dtype, name=f"block{i}")(x, train)
            x = x + skip.astype(self.dtype)
        x = LinknetBlock(32, dtype=self.dtype, name="block4")(x, train)
        return x


# ---------------------------------------------------------------------------
# PSPNet (Zhao et al. 2017)
# ---------------------------------------------------------------------------

class PSPDecoder(nn.Module):
    out_channels: int = 512
    bins: Sequence[int] = (1, 2, 3, 6)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        x = feats[5].astype(self.dtype)
        n, h, w, c = x.shape
        branch_ch = max(c // len(self.bins), 32)
        branches = [x]
        for bi, b in enumerate(self.bins):
            # adaptive average pool to (b, b): static window since h,w are
            # known at trace time; clamp bins to the feature size so tiny
            # inputs (tests) still compile
            b = min(b, h, w)
            wh, ww = h // b, w // b
            pooled = nn.avg_pool(x, (wh, ww), strides=(wh, ww))
            y = ConvBnRelu(branch_ch, kernel=1, dtype=self.dtype,
                           name=f"psp{bi}")(pooled, train)
            branches.append(upsample_to(y, h, w))
        y = jnp.concatenate(branches, axis=-1)
        y = ConvBnRelu(self.out_channels, kernel=3, dtype=self.dtype,
                       name="bottleneck")(y, train)
        return upsample_to(y, h * 32, w * 32)


# ---------------------------------------------------------------------------
# MAnet (Fan et al. 2020) — PAB on the deepest feature + MFAB fusion blocks
# ---------------------------------------------------------------------------

class PAB(nn.Module):
    """Position-attention block: spatial self-attention via batched matmuls
    (rides the MXU)."""

    channels: int
    reduction: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        mid = max(c // self.reduction, 16)
        q = nn.Conv(mid, (1, 1), dtype=self.dtype, name="q")(x).reshape(n, h * w, mid)
        k = nn.Conv(mid, (1, 1), dtype=self.dtype, name="k")(x).reshape(n, h * w, mid)
        v = nn.Conv(c, (1, 1), dtype=self.dtype, name="v")(x).reshape(n, h * w, c)
        attn = jnp.einsum("nqc,nkc->nqk", q, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn / jnp.sqrt(float(mid)), axis=-1).astype(self.dtype)
        y = jnp.einsum("nqk,nkc->nqc", attn, v,
                       preferred_element_type=jnp.float32).astype(self.dtype)
        return x + y.reshape(n, h, w, c)


class MFAB(nn.Module):
    """Multi-scale fusion attention block: up2x, concat skip, SE-gated fuse."""

    channels: int
    reduction: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = upsample2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBnRelu(self.channels, dtype=self.dtype, name="conv1")(x, train)
        # channel attention
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        mid = max(self.channels // self.reduction, 8)
        s = nn.relu(nn.Conv(mid, (1, 1), dtype=self.dtype, name="fc1")(s))
        s = nn.sigmoid(nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                               name="fc2")(s))
        x = x * s
        x = ConvBnRelu(self.channels, dtype=self.dtype, name="conv2")(x, train)
        return x


class MAnetDecoder(nn.Module):
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        x = feats[5].astype(self.dtype)
        x = PAB(x.shape[-1], dtype=self.dtype, name="pab")(x)
        skips = [feats[4], feats[3], feats[2], feats[1], None]
        for i, ch in enumerate(self.decoder_channels):
            x = MFAB(ch, dtype=self.dtype, name=f"block{i}")(x, skips[i], train)
        return x


# ---------------------------------------------------------------------------
# PAN (Li et al. 2018) — FPA bottleneck + GAU decoder blocks
# ---------------------------------------------------------------------------

class FPA(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        # global branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="global")(g)
        # mid branch
        mid = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="mid")(x)
        # pyramid branch (7x7 → 5x5 → 3x3 at decreasing scales); only add
        # levels while the spatial size still divides by 2 (tiny inputs in
        # tests have a 2x2 deepest feature)
        levels = []
        y = x
        for kernel, name in ((7, "down1"), (5, "down2"), (3, "down3")):
            if y.shape[1] < 2 or y.shape[2] < 2:
                break
            y = nn.avg_pool(y, (2, 2), strides=(2, 2))
            y = ConvBnRelu(self.out_ch, kernel=kernel, dtype=self.dtype,
                           name=name)(y, train)
            levels.append(y)
        pyr = None
        for y in reversed(levels):
            pyr = y if pyr is None else y + upsample2x(pyr)
        pyr = upsample2x(pyr) if pyr is not None else jnp.ones_like(mid)
        return mid * pyr + g  # broadcast add of global context


class GAU(nn.Module):
    """Global attention upsample: high-level global context gates the skip."""

    out_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip, train: bool = False):
        # x: low-res high-level, skip: high-res low-level
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="gate")(g)
        g = nn.sigmoid(g)
        s = ConvBnRelu(self.out_ch, kernel=3, dtype=self.dtype,
                       name="skip_conv")(skip.astype(self.dtype), train)
        x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="up_conv")(x)
        return upsample2x(x) + s * g


class PANDecoder(nn.Module):
    decoder_channels: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        x = FPA(self.decoder_channels, dtype=self.dtype,
                name="fpa")(feats[5].astype(self.dtype), train)
        for i, skip in enumerate([feats[4], feats[3], feats[2], feats[1]]):
            x = GAU(self.decoder_channels, dtype=self.dtype,
                    name=f"gau{i}")(x, skip, train)
        return upsample2x(x)


# ---------------------------------------------------------------------------
# DeepLabV3 / DeepLabV3+ (Chen et al. 2017/2018)
# ---------------------------------------------------------------------------

class ASPP(nn.Module):
    out_ch: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        n, h, w, c = x.shape
        branches = [ConvBnRelu(self.out_ch, kernel=1, dtype=self.dtype,
                               name="b0")(x, train)]
        for i, r in enumerate(self.rates):
            y = nn.Conv(self.out_ch, (3, 3), kernel_dilation=(r, r),
                        padding=[(r, r), (r, r)], use_bias=False,
                        dtype=self.dtype, name=f"b{i + 1}_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"b{i + 1}_bn")(y)
            branches.append(nn.relu(y))
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBnRelu(self.out_ch, kernel=1, dtype=self.dtype,
                       name="global")(g, train)
        branches.append(jnp.broadcast_to(g, (n, h, w, self.out_ch)))
        y = jnp.concatenate(branches, axis=-1)
        return ConvBnRelu(self.out_ch, kernel=1, dtype=self.dtype,
                          name="project")(y, train)


class DeepLabV3Decoder(nn.Module):
    out_ch: int = 256
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        x = feats[5].astype(self.dtype)
        y = ASPP(self.out_ch, dtype=self.dtype, name="aspp")(x, train)
        y = ConvBnRelu(self.out_ch, kernel=3, dtype=self.dtype,
                       name="conv")(y, train)
        n, h, w, _ = y.shape
        return upsample_to(y, h * 32, w * 32)


class DeepLabV3PlusDecoder(nn.Module):
    out_ch: int = 256
    low_ch: int = 48
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        x = feats[5].astype(self.dtype)
        y = ASPP(self.out_ch, dtype=self.dtype, name="aspp")(x, train)
        n, h, w, _ = y.shape
        y = upsample_to(y, h * 8, w * 8)  # to stride 4
        low = ConvBnRelu(self.low_ch, kernel=1, dtype=self.dtype,
                         name="low_proj")(feats[2].astype(self.dtype), train)
        y = jnp.concatenate([y, low], axis=-1)
        y = ConvBnRelu(self.out_ch, kernel=3, dtype=self.dtype,
                       name="fuse1")(y, train)
        y = ConvBnRelu(self.out_ch, kernel=3, dtype=self.dtype,
                       name="fuse2")(y, train)
        return upsample_to(y, h * 32, w * 32)


def make_decoder(arch_l: str, decoder_channels: Sequence[int], dtype: Dtype):
    if arch_l == "fpn":
        return FPNDecoder(dtype=dtype)
    if arch_l == "linknet":
        return LinknetDecoder(dtype=dtype)
    if arch_l == "pspnet":
        return PSPDecoder(dtype=dtype)
    if arch_l == "manet":
        return MAnetDecoder(decoder_channels=tuple(decoder_channels), dtype=dtype)
    if arch_l == "pan":
        return PANDecoder(dtype=dtype)
    if arch_l == "deeplabv3":
        return DeepLabV3Decoder(dtype=dtype)
    if arch_l == "deeplabv3plus":
        return DeepLabV3PlusDecoder(dtype=dtype)
    raise ValueError(f"unsupported architecture '{arch_l}'")
