"""unet_watermark_tpu — TPU-native watermark detection & removal framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Dave-he/unet-watermark (reference at /root/reference, see SURVEY.md):
UNet-family segmentation models, synthetic training data generation, a
batched detect→inpaint repair pipeline, OCR-driven text-watermark removal,
and a self-improving auto-train loop — all designed for TPU meshes
(bf16 MXU compute, pjit/shard_map data & spatial parallelism, fused
XLA mask post-processing).
"""

__version__ = "0.1.0"

_LAZY = {
    "Config": ("unet_watermark_tpu.configs", "Config"),
    "get_cfg_defaults": ("unet_watermark_tpu.configs", "get_cfg_defaults"),
    "update_config": ("unet_watermark_tpu.configs", "update_config"),
    "WatermarkPredictor": ("unet_watermark_tpu.inference",
                           "WatermarkPredictor"),
    "WatermarkSegmentationModel": ("unet_watermark_tpu.models",
                                   "WatermarkSegmentationModel"),
    "SMPModelFactory": ("unet_watermark_tpu.models", "SMPModelFactory"),
    "create_model_from_config": ("unet_watermark_tpu.models",
                                 "create_model_from_config"),
    "train": ("unet_watermark_tpu.training", "train"),
    "AutoTrainingLoop": ("unet_watermark_tpu.training.auto_train",
                         "AutoTrainingLoop"),
}


def __getattr__(name):
    """Lazy top-level API — importing the package stays cheap (no jax)."""
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'unet_watermark_tpu' has no attribute "
                         f"'{name}'")


__all__ = ["__version__"] + sorted(_LAZY)
