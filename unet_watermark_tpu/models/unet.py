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


def fuse_up_kernel(w3: jax.Array) -> jax.Array:
    """Fold nearest-2x upsampling into a 3x3 conv kernel.

    nearest-up is itself a correlation of the zero-dilated input with
    ones(2,2); composing the two correlations gives a single 4x4 kernel
    K[a,b] = Σ_{da,db∈{0,1}} W[a-da, b-db] applied with lhs_dilation=2 and
    padding (2,2) — so conv(nearest_up(x), W, pad=1) runs as ONE conv with
    no upsampled tensor ever materialized. This is the HBM-bandwidth fix
    for the decoder's high-resolution stages (they are bandwidth-bound at
    16-64 channels, far below the MXU's 128 lanes).
    """
    k = jnp.zeros((4, 4) + w3.shape[2:], w3.dtype)
    for da in (0, 1):
        for db in (0, 1):
            k = k.at[da:da + 3, db:db + 3].add(w3)
    return k


def up_conv(x_low: jax.Array, w3: jax.Array, path: str = "") -> jax.Array:
    """conv3x3(nearest_up2x(x_low), w3, SAME) as one lhs-dilated conv."""
    from ..ops.quant import conv2d_maybe_quant

    k = fuse_up_kernel(w3)
    return conv2d_maybe_quant(
        x_low, k, strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), path=path)


def smart_conv3x3(x: jax.Array, w3: jax.Array,
                  lowering: str = "auto", path: str = "") -> jax.Array:
    """Stride-1 SAME 3x3 conv with a selectable lowering.

    "auto" resolves to the direct conv: the phase-space (s2d) lowering
    was built on an executed-MAC model (ops/s2d_conv.py) but LOSES on
    the real chip — full-model A/B on TPU v5e @512², direct vs s2d:
    457/471/1162 img/s vs 173/202/461 at batch 32/64/128
    (workspace/exp_ab_s2d.py). The transform's pad+transpose data
    movement and runtime weight expansion cost more than the MXU
    lane-padding they avoid. "s2d" stays as an explicit opt-in
    (exact, tested in tests/test_s2d_conv.py).

    "bt" = block-Toeplitz lane packing (ops/bt_conv.py) on the
    lane-starved thin-channel tail (exact; routing per choose_pack);
    also taken by "auto" when bt_conv.AUTO_ENABLED is set from the
    on-chip A/B."""
    from ..ops import bt_conv, s2d_conv

    lowering = (bt_conv.LOWERING_OVERRIDE or s2d_conv.LOWERING_OVERRIDE
                or lowering)
    if lowering == "s2d":
        return s2d_conv.s2d_conv3x3(x, w3)
    if lowering == "bt" or (lowering == "auto" and bt_conv.AUTO_ENABLED):
        pack = bt_conv.choose_pack(w3.shape[-1], x.shape[2])
        if pack:
            return bt_conv.bt_conv3x3(x, w3, pack, path=path)
    from ..ops.quant import conv2d_maybe_quant
    return conv2d_maybe_quant(
        x, w3, strides=(1, 1), padding=[(1, 1), (1, 1)], path=path)


def smart_up_conv(x_low: jax.Array, w3: jax.Array,
                  lowering: str = "auto", path: str = "") -> jax.Array:
    """conv3x3(nearest_up2x(x), SAME); lowering as in smart_conv3x3
    ("auto" = lhs-dilated direct, "s2d" = explicit phase-space,
    "bt" = lane-packed on the dilated grid)."""
    from ..ops import bt_conv, s2d_conv

    lowering = (bt_conv.LOWERING_OVERRIDE or s2d_conv.LOWERING_OVERRIDE
                or lowering)
    if lowering == "s2d":
        return s2d_conv.s2d_upconv3x3(x_low, fuse_up_kernel(w3))
    if lowering == "bt" or (lowering == "auto" and bt_conv.AUTO_ENABLED):
        pack = bt_conv.choose_pack(w3.shape[-1], 2 * x_low.shape[2])
        if pack:
            return bt_conv.bt_upconv(x_low, fuse_up_kernel(w3), pack,
                                     path=path)
    return up_conv(x_low, w3, path=path)


class SplitUpConcatConv(nn.Module):
    """Conv over concat(skips..., nearest_up(x_low)) without materializing
    either the upsample or the concat.

    Parameter layout matches nn.Conv(use_bias=False) over the concatenated
    input — kernel (3,3,Cskip+Cin,Cout) with the skip channels first — so
    checkpoints are interchangeable with the naive path. The concat
    decomposes as a sum of convs; the upsampled operand uses the fused
    lhs-dilated kernel (see fuse_up_kernel).
    """

    channels: int
    dtype: Any = jnp.bfloat16
    up_first: bool = False  # kernel channel order: [Cin|Cs] vs [Cs|Cin]
    lowering: str = "auto"  # auto | direct | s2d (phase-space thin convs)

    @nn.compact
    def __call__(self, x_low, skip_cat: Optional[jax.Array]):
        cin = x_low.shape[-1]
        cs = 0 if skip_cat is None else skip_cat.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, cs + cin, self.channels), jnp.float32).astype(self.dtype)
        if self.up_first:
            wx, ws = kernel[:, :, :cin], kernel[:, :, cin:]
        else:
            ws, wx = kernel[:, :, :cs], kernel[:, :, cs:]
        # the up and skip operands have separate activation statistics, so
        # each gets its own calibrated scale (":up" / ":skip" suffixes)
        from ..ops.quant import module_path
        p = module_path(self)
        y = smart_up_conv(x_low.astype(self.dtype), wx, self.lowering,
                          path=p + ":up" if p else "")
        if cs:
            y = y + smart_conv3x3(skip_cat.astype(self.dtype), ws,
                                  self.lowering,
                                  path=p + ":skip" if p else "")
        return y


class FusedUpConvBnRelu(nn.Module):
    """Drop-in ConvBnRelu for (up2x + concat + conv) heads — same param
    tree (conv/kernel, bn/*) as ConvBnRelu over the naive path."""

    channels: int
    dtype: Any = jnp.bfloat16
    up_first: bool = False
    lowering: str = "auto"

    @nn.compact
    def __call__(self, x_low, skip_cat, train: bool = False):
        y = SplitUpConcatConv(self.channels, dtype=self.dtype,
                              up_first=self.up_first,
                              lowering=self.lowering,
                              name="conv")(x_low, skip_cat)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(y)
        return nn.relu(y)


class SmartConv(nn.Module):
    """3x3 stride-1 conv with auto phase-space lowering; parameter tree
    identical to nn.Conv(use_bias=False) so checkpoints interchange."""

    channels: int
    dtype: Dtype = jnp.bfloat16
    lowering: str = "auto"

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.channels),
            jnp.float32).astype(self.dtype)
        from ..ops.quant import module_path
        return smart_conv3x3(x.astype(self.dtype), kernel, self.lowering,
                             path=module_path(self))


class ConvBnRelu(nn.Module):
    channels: int
    kernel: int = 3
    dtype: Dtype = jnp.bfloat16
    lowering: str = "auto"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.kernel == 3:
            x = SmartConv(self.channels, dtype=self.dtype,
                          lowering=self.lowering, name="conv")(x)
        else:
            pad = self.kernel // 2
            x = nn.Conv(self.channels, (self.kernel, self.kernel),
                        padding=[(pad, pad), (pad, pad)], use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


class DecoderBlock(nn.Module):
    """SMP-style decoder block: up2x → concat skip → (conv-bn-relu) x2.

    With fused=True (default) the first conv runs through
    FusedUpConvBnRelu — mathematically identical, same parameter tree, but
    the upsampled/concatenated intermediates never hit HBM.
    """

    channels: int
    dtype: Dtype = jnp.bfloat16
    fused: bool = True

    @nn.compact
    def __call__(self, x, skip: Optional[jax.Array] = None, train: bool = False):
        if self.fused:
            x = FusedUpConvBnRelu(self.channels, dtype=self.dtype,
                                  up_first=True, name="conv1")(
                                      x, skip, train)
        else:
            x = upsample2x(x)
            if skip is not None:
                x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            x = ConvBnRelu(self.channels, dtype=self.dtype,
                           name="conv1")(x, train)
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
    fused: bool = True

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        # feats: [identity, s2, s4, s8, s16, s32]
        skips = [feats[4], feats[3], feats[2], feats[1], None]
        x = feats[5]
        for i, ch in enumerate(self.decoder_channels):
            x = DecoderBlock(ch, dtype=self.dtype, fused=self.fused,
                             name=f"block{i}")(x, skips[i], train)
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
    fused: bool = True

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
                below = grid[(i + 1, j - 1)]
                cats = [grid[(i, k)] for k in range(j)]
                if self.fused:
                    skip_cat = jnp.concatenate(
                        [c.astype(self.dtype) for c in cats], axis=-1) \
                        if len(cats) > 1 else cats[0]
                    x = FusedUpConvBnRelu(
                        row_ch[i], dtype=self.dtype, up_first=False,
                        name=f"x_{i}_{j}_conv1")(below, skip_cat, train)
                else:
                    up = upsample2x(below)
                    x = jnp.concatenate(
                        [c.astype(up.dtype) for c in cats] + [up], axis=-1)
                    x = ConvBnRelu(row_ch[i], dtype=self.dtype,
                                   name=f"x_{i}_{j}_conv1")(x, train)
                x = ConvBnRelu(row_ch[i], dtype=self.dtype,
                               name=f"x_{i}_{j}_conv2")(x, train)
                grid[(i, j)] = x
        # final skip-less upsample block to stride 1
        x = DecoderBlock(self.decoder_channels[4], dtype=self.dtype,
                         fused=self.fused,
                         name="final_block")(grid[(0, 4)], None, train)
        return x


class SMPUnetPlusPlusDecoder(nn.Module):
    """UNet++ decoder matching segmentation-models-pytorch's implementation
    exactly — the structure behind every reference checkpoint
    (/root/reference/src/models/unet_model.py:29-73 builds smp.UnetPlusPlus;
    /root/reference/src/train.py:425-460 saves its state_dict).

    smp's UNet++ differs from the canonical Zhou grid: features index
    deepest-first, block ``x_{depth}_{layer}`` upsamples ``x_{d}_{l-1}``
    (its own spine advances one resolution per layer), interior blocks
    output the ENCODER skip width rather than decoder_channels, and concat
    order is [upsampled | skips... | encoder skip]. Block/parameter naming
    mirrors smp's ``decoder.blocks.x_{d}_{l}.conv{1,2}`` so reference .pth
    checkpoints import with zero unmapped decoder tensors
    (models/torch_import.py).
    """

    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16
    fused: bool = True

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        # drop identity, reverse: f[0]=stride32 head ... f[4]=stride2
        f = list(feats[1:])[::-1]
        skip_ch = [int(t.shape[-1]) for t in f[1:]] + [0]
        out_ch = list(self.decoder_channels)
        depth = len(out_ch) - 1  # 4 for the standard 5-stage pyramid

        def block(d, l, x, skip_cat):
            ch = out_ch[l] if d == 0 else skip_ch[l]
            return DecoderBlock(ch, dtype=self.dtype, fused=self.fused,
                                name=f"x_{d}_{l}")(x, skip_cat, train)

        dense: dict = {}
        for layer in range(depth):
            for d in range(depth - layer):
                li = d + layer
                if layer == 0:
                    dense[(d, d)] = block(d, d, f[d], f[d + 1])
                else:
                    cats = [dense[(i, li)] for i in range(d + 1, li + 1)]
                    cats.append(f[li + 1])
                    skip_cat = jnp.concatenate(
                        [c.astype(self.dtype) for c in cats], axis=-1)
                    dense[(d, li)] = block(d, li, dense[(d, li - 1)],
                                           skip_cat)
        # final skip-less block to stride 1
        return DecoderBlock(out_ch[depth], dtype=self.dtype, fused=self.fused,
                            name=f"x_0_{depth}")(dense[(0, depth - 1)], None,
                                                 train)


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Depth-to-space (ESPCN sub-pixel head, Shi et al. 2016): move r²
    channel groups into an r×r spatial block. A reshape+transpose on a
    LOW-resolution tensor — the TPU-native alternative to running any
    conv at the full output resolution."""
    n, h, w, c = x.shape
    cout = c // (r * r)
    x = x.reshape(n, h, w, r, r, cout)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * r, w * r, cout)


class PixelShuffleHead(nn.Module):
    """Segmentation head that predicts r²·classes channels at 1/r of the
    output resolution and pixel-shuffles up — no conv ever runs at the
    full resolution. Output contract matches SegmentationHead
    ((N, r·H, r·W, classes) fp32 logits)."""

    classes: int = 1
    ratio: int = 4
    activation: Optional[str] = None
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.classes * self.ratio ** 2, (3, 3),
                    padding=[(1, 1), (1, 1)], dtype=self.dtype,
                    name="conv")(x)
        x = pixel_shuffle(x.astype(jnp.float32), self.ratio)
        if self.activation == "sigmoid":
            x = nn.sigmoid(x)
        elif self.activation == "softmax":
            x = nn.softmax(x, axis=-1)
        elif self.activation not in (None, "identity"):
            raise ValueError(f"unsupported activation {self.activation}")
        return x


class LaneAlignedDecoder(nn.Module):
    """TPU-native segmentation decoder: every conv ≥64 output channels,
    nothing runs above 1/4 of the input resolution.

    The round-4 per-kernel trace (docs/PERFORMANCE.md "Where the time
    goes") showed the SMP-contract decoders spend their time in exactly
    the stages that cannot use the MXU: 32-channel convs at 256² (1/4 of
    the 128 lanes) and 16-channel convs at 512² (1/8). This decoder is
    the redesign: the upsampling path stops at 128² with 128-channel
    (lane-full) stages, the stride-2 skip (256², 64ch) joins DOWN at 128²
    through a strided conv instead of pulling the decoder UP to 256², and
    the head is a ×4 pixel shuffle (PixelShuffleHead) so the 512² mask is
    assembled by a reshape, not a conv. Stage math reuses the fused
    lhs-dilated up-convs (FusedUpConvBnRelu), so the int8 PTQ tier and
    calibration ride along unchanged.

    Structure (resnet34 feature contract: [id, s2:64, s4:64, s8:128,
    s16:256, s32:512]), default (slim) plan:
        block0: 16² 512 →up→ 32², skip s16 → 256ch (+1 refine conv)
        block1: 32² 256 →up→ 64², skip s8  → 128ch
        block2: 64² 128 →up→ 128², skip s4 → 64ch
        skip2_reduce: s2 (256², 64) → stride-2 conv → 128² 64ch
        fuse:   concat(block2, skip2_reduce) → 64ch conv @128²
    Output: (N, H/4, W/4, fuse_channels) — pair with PixelShuffleHead.

    The first plan shipped fat — stages (256,128,128), double convs
    everywhere, fuse 128×2 — and its on-chip probe
    (experiments/exp_unettpu_probe.log, round 5) measured 77.4% MFU
    bf16 but 77.6 GF/img, landing int8 at 2,770 img/s: BELOW the
    shipped 54.5 GF Unet (2,911). Lesson: lane alignment fixes the
    utilization axis, but the FLOP budget still has to match the
    baseline. This slim plan holds the lane invariants (≥64ch, nothing
    above 1/4 res) at Unet-equal ~54 GF/img, so the measured MFU gap
    converts into throughput instead of being spent on extra capacity.
    `stage_refine[i]` appends a 3×3 refine conv after stage i — only
    the 32² stage keeps one (1.2 GF; at 128² it would cost 4.8).
    """

    stage_channels: Sequence[int] = (256, 128, 64)
    stage_refine: Sequence[bool] = (True, False, False)
    fuse_channels: int = 64
    skip2_channels: int = 64
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats: List[jax.Array], train: bool = False):
        from ..ops.quant import QConv

        # feats: [identity, s2, s4, s8, s16, s32]
        x = feats[5]
        skips = [feats[4], feats[3], feats[2]]
        for i, ch in enumerate(self.stage_channels):
            x = FusedUpConvBnRelu(ch, dtype=self.dtype, up_first=True,
                                  name=f"block{i}_conv1")(x, skips[i], train)
            if self.stage_refine[i]:
                x = ConvBnRelu(ch, dtype=self.dtype,
                               name=f"block{i}_conv2")(x, train)
        s2 = QConv(self.skip2_channels, (3, 3), strides=(2, 2),
                   padding=[(1, 1), (1, 1)], dtype=self.dtype,
                   name="skip2_reduce")(feats[1].astype(self.dtype))
        s2 = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype,
                          name="skip2_bn")(s2)
        s2 = nn.relu(s2)
        x = jnp.concatenate([x, s2], axis=-1)
        x = ConvBnRelu(self.fuse_channels, dtype=self.dtype,
                       name="fuse_conv1")(x, train)
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
