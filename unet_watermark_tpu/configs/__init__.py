from .config import (
    Config,
    ModelConfig,
    DataConfig,
    TrainConfig,
    LossConfig,
    OptimizerConfig,
    PredictConfig,
    ValConfig,
    TextWatermarkConfig,
    ParallelConfig,
    get_cfg_defaults,
    update_config,
)

__all__ = [
    "Config",
    "ModelConfig",
    "DataConfig",
    "TrainConfig",
    "LossConfig",
    "OptimizerConfig",
    "PredictConfig",
    "ValConfig",
    "TextWatermarkConfig",
    "ParallelConfig",
    "get_cfg_defaults",
    "update_config",
]
