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
