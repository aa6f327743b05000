from .dataset import (
    Subset,
    WatermarkDataset,
    create_datasets,
    dataset_dirs_from_config,
)
from .pipeline import DataPipeline, make_pipelines

__all__ = [
    "Subset",
    "WatermarkDataset",
    "create_datasets",
    "dataset_dirs_from_config",
    "DataPipeline",
    "make_pipelines",
]
