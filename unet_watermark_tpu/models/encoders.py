"""Encoder backbones (TPU-native, NHWC, bf16-compute).

Re-provides the encoder families the reference reaches through
segmentation-models-pytorch (/root/reference/src/models/unet_model.py:29-73):
ResNet-18/34/50/101/152 and EfficientNet-B0..B7. Implemented from the
original papers in Flax linen with:

  * NHWC layout (TPU-preferred; conv lowers onto the MXU without transposes)
  * parameterized compute dtype (bfloat16 by default) with fp32 params
  * feature pyramid output at strides [1, 2, 4, 8, 16, 32] matching the
    SMP encoder contract (identity + 5 stages) so decoders are interchangeable
  * optional jax.checkpoint (remat) per stage to trade FLOPs for HBM

Module/parameter names deliberately mirror the torchvision/SMP state_dict
layout (conv1, bn1, layer1..layer4, blocks) so the .pth importer
(models/torch_import.py) can map checkpoints by name.
"""
from __future__ import annotations

import math
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.quant import QConv

Dtype = Any


class ResNetBasicBlock(nn.Module):
    """BasicBlock: conv3x3-bn-relu, conv3x3-bn, (+downsample), relu."""

    channels: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        y = QConv(self.channels, (3, 3), strides=(self.strides, self.strides),
                  padding=[(1, 1), (1, 1)], dtype=self.dtype,
                  name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = QConv(self.channels, (3, 3), strides=(1, 1),
                  padding=[(1, 1), (1, 1)], dtype=self.dtype,
                  name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        if self.downsample:
            identity = QConv(self.channels, (1, 1),
                             strides=(self.strides, self.strides),
                             dtype=self.dtype,
                             name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNetBottleneck(nn.Module):
    """Bottleneck: 1x1 reduce, 3x3, 1x1 expand (x4)."""

    channels: int
    strides: int = 1
    downsample: bool = False
    dtype: Dtype = jnp.bfloat16
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out_ch = self.channels * self.expansion
        y = QConv(self.channels, (1, 1), dtype=self.dtype,
                  name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = QConv(self.channels, (3, 3), strides=(self.strides, self.strides),
                  padding=[(1, 1), (1, 1)], dtype=self.dtype,
                  name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = QConv(out_ch, (1, 1), dtype=self.dtype,
                  name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            identity = QConv(out_ch, (1, 1),
                             strides=(self.strides, self.strides),
                             dtype=self.dtype,
                             name="downsample_conv")(x)
            identity = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=self.dtype,
                                    name="downsample_bn")(identity)
        return nn.relu(y + identity)


_RESNET_SPECS = {
    # name: (block, layers, stage_width_base)
    "resnet18": (ResNetBasicBlock, (2, 2, 2, 2)),
    "resnet34": (ResNetBasicBlock, (3, 4, 6, 3)),
    "resnet50": (ResNetBottleneck, (3, 4, 6, 3)),
    "resnet101": (ResNetBottleneck, (3, 4, 23, 3)),
    "resnet152": (ResNetBottleneck, (3, 8, 36, 3)),
}


class ResNetEncoder(nn.Module):
    """ResNet feature-pyramid encoder.

    Returns [x, s2, s4, s8, s16, s32] — the SMP 6-feature contract
    (identity + conv1-relu + layer1..layer4 outputs).
    """

    variant: str = "resnet34"
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return resnet_out_channels(self.variant)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        block_cls, layers = _RESNET_SPECS[self.variant]
        feats: List[jax.Array] = [x]

        y = QConv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                  dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        feats.append(y)  # stride 2

        # 3x3/2 max-pool with SAME-style torch padding (pad 1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        # remat: rematerialize each residual block in the backward pass,
        # trading FLOPs for HBM (SURVEY.md §"HBM bandwidth").
        cls = nn.remat(block_cls, static_argnums=(2,)) if self.remat else block_cls

        widths = (64, 128, 256, 512)
        for stage_idx, (num_blocks, width) in enumerate(zip(layers, widths)):
            stage_stride = 1 if stage_idx == 0 else 2
            for block_idx in range(num_blocks):
                strides = stage_stride if block_idx == 0 else 1
                needs_down = block_idx == 0 and (
                    strides != 1
                    or (stage_idx == 0 and block_cls is ResNetBottleneck)
                )
                y = cls(channels=width, strides=strides,
                        downsample=needs_down, dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{block_idx}")(y, train)
            feats.append(y)  # strides 4, 8, 16, 32
        return feats


def resnet_out_channels(variant: str) -> Tuple[int, ...]:
    block_cls, _ = _RESNET_SPECS[variant]
    if block_cls is ResNetBasicBlock:
        return (3, 64, 64, 128, 256, 512)
    return (3, 64, 256, 512, 1024, 2048)


# ---------------------------------------------------------------------------
# EfficientNet (B0..B7) — MBConv encoder, matching timm-efficientnet feature
# taps at strides [2, 4, 8, 16, 32].
# ---------------------------------------------------------------------------

def _round_channels(ch: float, multiplier: float, divisor: int = 8) -> int:
    ch *= multiplier
    new_ch = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * ch:
        new_ch += divisor
    return int(new_ch)


def _round_repeats(repeats: int, multiplier: float) -> int:
    return int(math.ceil(multiplier * repeats))


# (expand_ratio, kernel, stride, in_ch, out_ch, repeats, se_ratio)
_EFFNET_BASE_BLOCKS = [
    (1, 3, 1, 32, 16, 1, 0.25),
    (6, 3, 2, 16, 24, 2, 0.25),
    (6, 5, 2, 24, 40, 2, 0.25),
    (6, 3, 2, 40, 80, 3, 0.25),
    (6, 5, 1, 80, 112, 3, 0.25),
    (6, 5, 2, 112, 192, 4, 0.25),
    (6, 3, 1, 192, 320, 1, 0.25),
]

_EFFNET_PARAMS = {
    # name: (width_mult, depth_mult)
    "efficientnet-b0": (1.0, 1.0),
    "efficientnet-b1": (1.0, 1.1),
    "efficientnet-b2": (1.1, 1.2),
    "efficientnet-b3": (1.2, 1.4),
    "efficientnet-b4": (1.4, 1.8),
    "efficientnet-b5": (1.6, 2.2),
    "efficientnet-b6": (1.8, 2.6),
    "efficientnet-b7": (2.0, 3.1),
}


class SqueezeExcite(nn.Module):
    reduced_ch: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        s = jnp.mean(x, axis=(1, 2), keepdims=True)
        s = nn.Conv(self.reduced_ch, (1, 1), dtype=self.dtype, name="reduce")(s)
        s = nn.swish(s)
        s = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(s)
        return x * nn.sigmoid(s)


class MBConv(nn.Module):
    out_ch: int
    expand_ratio: int
    kernel: int
    strides: int
    se_ratio: float
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        identity = x
        y = x
        mid = in_ch * self.expand_ratio
        if self.expand_ratio != 1:
            y = nn.Conv(mid, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand_conv")(y)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=self.dtype, name="expand_bn")(y)
            y = nn.swish(y)
        pad = self.kernel // 2
        y = nn.Conv(mid, (self.kernel, self.kernel),
                    strides=(self.strides, self.strides),
                    padding=[(pad, pad), (pad, pad)],
                    feature_group_count=mid, use_bias=False, dtype=self.dtype,
                    name="dw_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="dw_bn")(y)
        y = nn.swish(y)
        if self.se_ratio > 0:
            y = SqueezeExcite(max(1, int(in_ch * self.se_ratio)),
                              dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="project_bn")(y)
        if self.strides == 1 and in_ch == self.out_ch:
            y = y + identity
        return y


class EfficientNetEncoder(nn.Module):
    """EfficientNet-Bx MBConv encoder with SMP 6-feature contract.

    Feature taps follow the SMP/timm convention: stem (stride 2), end of
    stage 2 (stride 4), stage 3 (stride 8), stage 5 (stride 16),
    stage 7 (stride 32).
    """

    variant: str = "efficientnet-b3"
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return efficientnet_out_channels(self.variant)

    @nn.compact
    def __call__(self, x, train: bool = False) -> List[jax.Array]:
        width_mult, depth_mult = _EFFNET_PARAMS[self.variant]
        feats: List[jax.Array] = [x]

        stem_ch = _round_channels(32, width_mult)
        y = nn.Conv(stem_ch, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype, name="stem_conv")(
                        x.astype(self.dtype))
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="stem_bn")(y)
        y = nn.swish(y)

        # Stride-2 tap BEFORE any stage that downsamples again.
        tap_after_stage = {1: 2, 2: 3, 4: 4, 6: 5}  # stage idx → feats slot
        block_id = 0
        stage_outputs = {}
        for stage_idx, (er, k, s, cin, cout, reps, se) in enumerate(
                _EFFNET_BASE_BLOCKS):
            out_ch = _round_channels(cout, width_mult)
            repeats = _round_repeats(reps, depth_mult)
            for r in range(repeats):
                strides = s if r == 0 else 1
                y = MBConv(out_ch=out_ch, expand_ratio=er, kernel=k,
                           strides=strides, se_ratio=se, dtype=self.dtype,
                           name=f"block{block_id}")(y, train)
                block_id += 1
            stage_outputs[stage_idx] = y
        # assemble pyramid: stem(s2 tap is stage 0 output — stride 2),
        # stage1 end = stride 4, stage2 end = stride 8, stage4 end = stride 16,
        # stage6 end = stride 32
        feats.append(stage_outputs[0])   # stride 2 (stage 0 keeps stride 2)
        feats.append(stage_outputs[1])   # stride 4
        feats.append(stage_outputs[2])   # stride 8
        feats.append(stage_outputs[4])   # stride 16
        feats.append(stage_outputs[6])   # stride 32
        return feats


def efficientnet_out_channels(variant: str) -> Tuple[int, ...]:
    width_mult, _ = _EFFNET_PARAMS[variant]
    chans = [_round_channels(c, width_mult)
             for c in (16, 24, 40, 112, 320)]
    return (3, chans[0], chans[1], chans[2], chans[3], chans[4])


# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def get_encoder(name: str, dtype: Dtype = jnp.bfloat16,
                remat: bool = False) -> nn.Module:
    """Encoder factory analog of SMP's get_encoder
    (used via /root/reference/src/models/unet_model.py:64-71)."""
    name = name.replace("timm-", "")
    if name in _RESNET_SPECS:
        return ResNetEncoder(variant=name, dtype=dtype, remat=remat)
    if name in _EFFNET_PARAMS:
        return EfficientNetEncoder(variant=name, dtype=dtype, remat=remat)
    raise ValueError(
        f"unsupported encoder '{name}'. available: "
        f"{sorted(_RESNET_SPECS) + sorted(_EFFNET_PARAMS)}")


def get_encoder_channels(name: str) -> Tuple[int, ...]:
    name = name.replace("timm-", "")
    if name in _RESNET_SPECS:
        return resnet_out_channels(name)
    if name in _EFFNET_PARAMS:
        return efficientnet_out_channels(name)
    raise ValueError(f"unsupported encoder '{name}'")


def available_encoders() -> List[str]:
    """Analog of /root/reference/src/models/unet_model.py:75-90."""
    return sorted(_RESNET_SPECS) + sorted(_EFFNET_PARAMS)
