"""Text-watermark specialization (reference src/text/)."""
from .train_text_watermark import TextWatermarkTrainer

__all__ = ["TextWatermarkTrainer"]
