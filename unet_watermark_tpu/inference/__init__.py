from . import maskproc, tiled
from .engines import get_engine
from .predict import WatermarkPredictor

__all__ = ["WatermarkPredictor", "get_engine", "maskproc", "tiled"]
