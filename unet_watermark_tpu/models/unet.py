"""UNet / UNet++ segmentation models (TPU-native, NHWC).

Replaces the SMP models the reference constructs at
/root/reference/src/models/unet_model.py:29-73. Decoders follow the SMP
contract: 6-level encoder pyramid in (identity + strides 2..32), the
identity feature is not used as a skip, and the decoder runs 5 upsample
stages back to stride 1 with `decoder_channels` widths
([256,128,64,32,16] by default, /root/reference/src/configs/config.py:19).

TPU-first details:
  * nearest-neighbor 2x upsample is a reshape+broadcast (no gather), which
    XLA fuses into the following conv's input
  * all convs are 3x3 NHWC bf16 → MXU; BN+ReLU fuse into the conv epilogue
  * static shapes throughout; no data-dependent control flow
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def upsample2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbor 2x upsampling as reshape+broadcast.

    Equivalent to F.interpolate(scale_factor=2, mode="nearest") used by SMP
    decoder blocks, but expressed so XLA lowers it to a cheap broadcast
    instead of a gather.
    """
    n, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


class ConvBnRelu(nn.Module):
    channels: int
    kernel: int = 3
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(self.channels, (self.kernel, self.kernel),
                    padding=[(pad, pad), (pad, pad)], use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    """SMP-style decoder block: up2x → concat skip → (conv-bn-relu) x2."""

    channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None, train: bool = False):
        x = upsample2x(x)
        if skip is not None:
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
        x = ConvBnRelu(self.channels, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBnRelu(self.channels, dtype=self.dtype, name="conv2")(x, train)
        return x


class UnetDecoder(nn.Module):
    """Classic UNet decoder over the SMP feature contract.

    Matches SMP UnetDecoder structure 1:1 (5 DecoderBlocks, head at the
    deepest feature, skips = strides 16,8,4,2, final block skip-less),
    which keeps the .pth importer a pure name map.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        # feats: [identity, s2, s4, s8, s16, s32]
        skips = [feats[4], feats[3], feats[2], feats[1], None]
        x = feats[5]
        for i, ch in enumerate(self.decoder_channels):
            x = DecoderBlock(ch, dtype=self.dtype, name=f"block{i}")(
                x, skips[i], train)
        return x


class UnetPlusPlusDecoder(nn.Module):
    """UNet++ nested dense decoder (Zhou et al. 2018, arXiv:1807.10165).

    Canonical dense grid X[i][j]: row i is the stride-2^(i+1) resolution,
    X[i][0] the encoder feature, and
        X[i][j] = Block(concat(X[i][0..j-1]), up2x(X[i+1][j-1]))
    computed for i + j <= 4. Row widths follow decoder_channels reversed
    (row 0 → decoder_channels[3] ... row 3 → decoder_channels[0]); a final
    skip-less block upsamples X[0][4] to stride 1 with decoder_channels[4]
    channels — same output contract as SMP's UnetPlusPlusDecoder.
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        # rows 0..4: encoder features at strides 2,4,8,16,32
        grid: dict = {}
        for i in range(5):
            grid[(i, 0)] = feats[i + 1]
        row_ch = [self.decoder_channels[3], self.decoder_channels[2],
                  self.decoder_channels[1], self.decoder_channels[0]]
        for j in range(1, 5):                 # columns
            for i in range(0, 5 - j):         # rows
                below = upsample2x(grid[(i + 1, j - 1)])
                cats = [grid[(i, k)].astype(below.dtype) for k in range(j)]
                x = jnp.concatenate(cats + [below], axis=-1)
                x = ConvBnRelu(row_ch[i], dtype=self.dtype,
                               name=f"x_{i}_{j}_conv1")(x, train)
                x = ConvBnRelu(row_ch[i], dtype=self.dtype,
                               name=f"x_{i}_{j}_conv2")(x, train)
                grid[(i, j)] = x
        # final skip-less upsample block to stride 1
        x = DecoderBlock(self.decoder_channels[4], dtype=self.dtype,
                         name="final_block")(grid[(0, 4)], None, train)
        return x


class SegmentationHead(nn.Module):
    """3x3 conv head → `classes` logits (SMP SegmentationHead analog)."""

    classes: int = 1
    activation: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.classes, (3, 3), padding=[(1, 1), (1, 1)],
                    dtype=self.dtype, name="conv")(x)
        x = x.astype(jnp.float32)  # logits always fp32 for stable loss/sigmoid
        if self.activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.activation == "softmax":
            x = nn.softmax(x, axis=-1)
        elif self.activation not in (None, "identity"):
            raise ValueError(f"unsupported activation {self.activation}")
        return x
