"""Diffusion repair backends (reference src/sd3/ + src/flux/).

Optional heavy backends: Stable Diffusion 3 inpainting and FLUX Kontext
editing. Both are gated on `diffusers` (not present in the TPU image);
when missing, every entry point degrades to the in-process inpaint engines
(inference/engines.py) so pipelines keep producing output — mirroring the
reference's own fallback ladders (sd3/inpaint.py:32-72).
"""
from .sd3_inpaint import SDWatermarkRemover, diffusers_available
from .flux_process import FluxProcessor

__all__ = ["SDWatermarkRemover", "FluxProcessor", "diffusers_available"]
