"""Model factory — analog of /root/reference/src/models/unet_model.py.

`SUPPORTED_MODELS` mirrors the 9-architecture table at unet_model.py:17-27;
`create_model` / `create_model_from_config` / `WatermarkSegmentationModel`
mirror :29, :93 and :123. Architectures are registered lazily so the factory
stays the single construction point as more decoder families land.
"""
from __future__ import annotations

from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .encoders import get_encoder, get_encoder_channels, available_encoders
from .unet import (
    LaneAlignedDecoder,
    PixelShuffleHead,
    SegmentationHead,
    SMPUnetPlusPlusDecoder,
    UnetDecoder,
    UnetPlusPlusDecoder,
)

Dtype = Any


class SegmentationModel(nn.Module):
    """Encoder + decoder + head. NHWC in, (N,H,W,classes) fp32 logits out."""

    arch: str = "UnetPlusPlus"
    encoder_name: str = "resnet34"
    decoder_channels: Sequence[int] = (256, 128, 64, 32, 16)
    classes: int = 1
    activation: Optional[str] = None
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    fused: bool = True
    decoder_impl: str = "canonical"

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.ndim != 4 or x.shape[-1] != 3:
            raise ValueError(
                f"expected NHWC input with 3 channels, got {x.shape}")
        if x.shape[1] % 32 or x.shape[2] % 32:
            raise ValueError(
                f"H and W must be multiples of 32 (5 stride-2 stages); got "
                f"{x.shape[1]}x{x.shape[2]}. Use inference.tiled/pad helpers "
                f"for arbitrary sizes.")
        encoder = get_encoder(self.encoder_name, dtype=self.dtype,
                              remat=self.remat)
        feats = encoder.copy(name="encoder")(x, train)
        decoder = _make_decoder(self.arch, self.decoder_channels,
                                self.dtype, self.fused, self.decoder_impl,
                                remat=self.remat)
        y = decoder.copy(name="decoder")(feats, train)
        if self.arch.lower() == "unettpu":
            # lane-aligned tier: decoder stops at 1/4 res; the head is a
            # ×4 pixel shuffle so no conv runs at full resolution
            y = PixelShuffleHead(classes=self.classes, ratio=4,
                                 activation=self.activation,
                                 dtype=self.dtype,
                                 name="segmentation_head")(y)
        else:
            y = SegmentationHead(classes=self.classes,
                                 activation=self.activation,
                                 dtype=self.dtype,
                                 name="segmentation_head")(y)
        return y


def _make_decoder(arch: str, decoder_channels: Sequence[int], dtype: Dtype,
                  fused: bool = True, decoder_impl: str = "canonical",
                  remat: bool = False):
    arch_l = arch.lower()
    if arch_l == "unet":
        cls = UnetDecoder
        kwargs = dict(decoder_channels=tuple(decoder_channels),
                      dtype=dtype, fused=fused)
    elif arch_l == "unettpu":
        # TPU-native lane-aligned tier: fixed ≥64-channel stage plan (the
        # decoder_channels knob describes the SMP 5-stage contract, which
        # this decoder intentionally abandons — docs/PERFORMANCE.md)
        cls = LaneAlignedDecoder
        kwargs = dict(dtype=dtype)
    elif arch_l in ("unetplusplus", "unet++"):
        cls = (SMPUnetPlusPlusDecoder if decoder_impl == "smp"
               else UnetPlusPlusDecoder)
        kwargs = dict(decoder_channels=tuple(decoder_channels),
                      dtype=dtype, fused=fused)
    else:
        # Families implemented in archs.py (imported lazily: avoids cycles).
        from . import archs
        return archs.make_decoder(arch_l, decoder_channels, dtype)
    if remat:
        # MODEL.REMAT covers the DECODER too (round 4): the backward pass
        # stores only the encoder feature pyramid and recomputes the
        # dense-grid activations — at 512² batch 128 those bf16 temps are
        # 256 MB each and were the OOM driver with a device-resident
        # corpus. Same static-train-arg treatment as the encoder blocks
        # (encoders.py:146).
        cls = nn.remat(cls, static_argnums=(2,))
    return cls(**kwargs)


# Mirrors /root/reference/src/models/unet_model.py:17-27, plus the
# TPU-native UnetTPU tier (not in the reference: lane-aligned decoder +
# pixel-shuffle head, the round-5 performance architecture).
SUPPORTED_MODELS = {
    "UnetTPU": "TPU lane-aligned U-Net: ≥64ch stages, ×4 sub-pixel head",
    "Unet": "U-Net encoder-decoder with skip connections",
    "UnetPlusPlus": "UNet++ nested dense skip connections",
    "MAnet": "Multi-scale attention network",
    "Linknet": "LinkNet residual decoder",
    "FPN": "Feature pyramid network head",
    "PSPNet": "Pyramid scene parsing pooling head",
    "PAN": "Pyramid attention network",
    "DeepLabV3": "ASPP dilated-context head",
    "DeepLabV3Plus": "ASPP + low-level-feature decoder",
}


def canonical_model_name(model_name: str) -> str:
    """Resolve a model-name alias ('unet++', any case) to its canonical
    SUPPORTED_MODELS key. Shared by the factory and the shipped-weights
    filename scheme (utils/shipping.py) so an aliased config finds the
    same weights file the canonical one does."""
    canon = {k.lower(): k for k in SUPPORTED_MODELS}
    canon["unet++"] = "UnetPlusPlus"
    if model_name.lower() not in canon:
        raise ValueError(
            f"unsupported model '{model_name}'. "
            f"supported: {list(SUPPORTED_MODELS)}")
    return canon[model_name.lower()]


class SMPModelFactory:
    """Analog of /root/reference/src/models/unet_model.py:14-90."""

    SUPPORTED_MODELS = SUPPORTED_MODELS

    @staticmethod
    def create_model(model_name: str = "UnetPlusPlus",
                     encoder_name: str = "resnet34",
                     encoder_weights: Optional[str] = "imagenet",
                     in_channels: int = 3,
                     classes: int = 1,
                     decoder_channels: Sequence[int] = (256, 128, 64, 32, 16),
                     activation: Optional[str] = None,
                     dtype: Dtype = jnp.bfloat16,
                     remat: bool = False,
                     fused: bool = True,
                     decoder_impl: str = "canonical",
                     **kwargs) -> SegmentationModel:
        model_name = canonical_model_name(model_name)
        get_encoder_channels(encoder_name)  # validate encoder early
        if in_channels != 3:
            raise NotImplementedError("in_channels != 3 not yet supported")
        return SegmentationModel(
            arch=model_name,
            encoder_name=encoder_name,
            decoder_channels=tuple(decoder_channels),
            classes=classes,
            activation=activation,
            dtype=dtype,
            remat=remat,
            fused=fused,
            decoder_impl=decoder_impl,
        )

    @staticmethod
    def get_available_encoders() -> List[str]:
        return available_encoders()


def create_model_from_config(cfg) -> SegmentationModel:
    """Analog of /root/reference/src/models/unet_model.py:93-120."""
    return SMPModelFactory.create_model(
        model_name=cfg.MODEL.NAME,
        encoder_name=cfg.MODEL.ENCODER_NAME,
        encoder_weights=cfg.MODEL.ENCODER_WEIGHTS,
        in_channels=cfg.MODEL.IN_CHANNELS,
        classes=cfg.MODEL.CLASSES,
        decoder_channels=cfg.MODEL.DECODER_CHANNELS,
        activation=cfg.MODEL.ACTIVATION,
        dtype=jnp.dtype(cfg.MODEL.DTYPE),
        remat=cfg.MODEL.REMAT,
        fused=cfg.MODEL.FUSED_DECODER,
        decoder_impl=getattr(cfg.MODEL, "DECODER_IMPL", "canonical"),
    )


def init_model(model: SegmentationModel, img_size: int, seed: int = 0,
               batch: int = 1):
    """Initialize parameters + batch stats with a dummy NHWC batch."""
    rng = jax.random.PRNGKey(seed)
    dummy = jnp.zeros((batch, img_size, img_size, 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return variables


def count_parameters(variables) -> int:
    """Analog of param counting at unet_model.py:139-146."""
    params = variables["params"] if "params" in variables else variables
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(params))


class WatermarkSegmentationModel:
    """Config-driven wrapper — analog of unet_model.py:123-149.

    Bundles the Flax module with its initialized variables and exposes a
    jitted `apply`.
    """

    def __init__(self, cfg, seed: int = 0):
        self.cfg = cfg
        self.model = create_model_from_config(cfg)
        self.variables = init_model(self.model, cfg.DATA.IMG_SIZE, seed=seed)
        self._apply = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._apply(self.variables, x)

    def get_model_info(self) -> dict:
        return {
            "model_name": self.cfg.MODEL.NAME,
            "encoder_name": self.cfg.MODEL.ENCODER_NAME,
            "parameters": count_parameters(self.variables),
            "input_size": self.cfg.DATA.IMG_SIZE,
            "classes": self.cfg.MODEL.CLASSES,
        }
