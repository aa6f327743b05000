from .factory import (
    SegmentationModel,
    SMPModelFactory,
    SUPPORTED_MODELS,
    WatermarkSegmentationModel,
    count_parameters,
    create_model_from_config,
    init_model,
)
from .encoders import available_encoders, get_encoder, get_encoder_channels

__all__ = [
    "SegmentationModel",
    "SMPModelFactory",
    "SUPPORTED_MODELS",
    "WatermarkSegmentationModel",
    "count_parameters",
    "create_model_from_config",
    "init_model",
    "available_encoders",
    "get_encoder",
    "get_encoder_channels",
]
