"""Typed configuration tree for the TPU-native watermark framework.

Replaces the reference's two config systems — the YACS tree
(/root/reference/src/configs/config.py:8-96) and the optimization dataclass
tree (/root/reference/src/utils/optimization_config.py:202-590) — with one
typed dataclass hierarchy. Section and field names mirror the YACS tree so
existing YAML files (unet_watermark.yaml etc.) load unmodified; extra keys
that only make sense on GPUs (e.g. USE_AMP) are kept as accepted-but-mapped
fields (AMP maps to bf16 compute, which is native on TPU).

Precedence matches the reference CLI: explicit overrides > YAML > defaults
(/root/reference/src/cli.py:58-92).
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class ModelConfig:
    """Mirrors MODEL.* (/root/reference/src/configs/config.py:14-22)."""

    NAME: str = "UnetPlusPlus"
    ENCODER_NAME: str = "resnet34"
    ENCODER_WEIGHTS: Optional[str] = "imagenet"
    ENCODER_DEPTH: int = 5
    DECODER_CHANNELS: List[int] = field(default_factory=lambda: [256, 128, 64, 32, 16])
    IN_CHANNELS: int = 3
    CLASSES: int = 1
    ACTIVATION: Optional[str] = None
    # TPU-specific knobs (no reference counterpart):
    DTYPE: str = "bfloat16"          # compute dtype for the forward pass
    PARAM_DTYPE: str = "float32"     # parameter storage dtype
    REMAT: bool = False              # jax.checkpoint over encoder stages
    FUSED_DECODER: bool = True       # fold upsample+concat into the conv
    # UNet++ decoder structure: "canonical" (Zhou et al. grid, the flagship)
    # or "smp" (bit-exact segmentation-models-pytorch layout, required to
    # load reference .pth checkpoints; auto-selected when importing one).
    DECODER_IMPL: str = "canonical"


@dataclass
class DataConfig:
    """Mirrors DATA.* (/root/reference/src/configs/config.py:25-38)."""

    ROOT_DIR: str = "data/train"
    ADDITIONAL_ROOT_DIRS: List[str] = field(default_factory=list)
    IMG_SIZE: int = 512
    GENERATE_MASK_THRESHOLD: int = 30
    TRAIN_RATIO: float = 0.8
    VAL_RATIO: float = 0.2
    SHUFFLE: bool = True
    SEED: int = 42
    NUM_WORKERS: int = 4
    CACHE_IMAGES: bool = False
    # disk memmap of decoded+resized uint8 samples (data/decoded_cache.py):
    # pays JPEG decode once, then epochs read page-cached memory — the fix
    # for host-bound epochs on few-core TPU hosts
    CACHE_DECODED: bool = True
    CACHE_DIR: Optional[str] = None  # default: <ROOT_DIR>/.decoded_cache
    # whole-corpus-in-HBM pipeline (data/pipeline.DeviceDataPipeline):
    # upload the decoded uint8 dataset once, batches become on-device
    # gathers — zero per-step H2D (the fix for tunnel/PCIe-bound epochs).
    # Applies on a single device when the corpus fits the MB budget.
    DEVICE_CACHE: bool = True
    DEVICE_CACHE_MB: int = 3072
    PREFETCH_FACTOR: int = 2
    AUGMENTATION_TYPE: str = "transparent_watermark"
    # accepted extras from unet_text_watermark.yaml
    TEXT_ENHANCEMENT: bool = False
    EDGE_ENHANCEMENT: bool = False
    CONTRAST_BOOST: float = 1.0


@dataclass
class TrainConfig:
    """Mirrors TRAIN.* (/root/reference/src/configs/config.py:41-56)."""

    BATCH_SIZE: int = 16
    EPOCHS: int = 300
    LR: float = 1e-4
    WEIGHT_DECAY: float = 1e-4
    OUTPUT_DIR: str = "logs/output"
    MODEL_SAVE_PATH: str = "models/unet_watermark.pth"
    LOG_INTERVAL: int = 10
    SAVE_INTERVAL: int = 50
    USE_EARLY_STOPPING: bool = True
    EARLY_STOPPING_PATIENCE: int = 10
    CHECKPOINT_DIR: str = "models/checkpoints"
    SAVE_BEST_ONLY: bool = False
    USE_AMP: bool = False            # on TPU: bf16 compute (native, no GradScaler)
    GRADIENT_CLIP: float = 1.0
    # TPU-specific knobs:
    DONATE_STATE: bool = True        # donate train state buffers under jit
    STEPS_PER_EXEC: int = 1          # lax.scan over this many steps per dispatch
    # whole-epoch lax.scan when the corpus is device-resident: one
    # dispatch + one scalar sync per epoch instead of one per batch
    # (training/train.make_train_epoch_scan). Disabled automatically when
    # LOG_INTERVAL-style per-batch logging is requested.
    EPOCH_SCAN: bool = True


@dataclass
class LossConfig:
    """Mirrors LOSS.* (/root/reference/src/configs/config.py:59-67)."""

    NAME: str = "DiceLoss"
    MODE: str = "binary"
    SMOOTH: float = 1e-5
    BCE_WEIGHT: float = 0.5
    DICE_WEIGHT: float = 0.5
    DICE_SMOOTH: float = 1e-5
    FOCAL_ALPHA: float = 0.25
    FOCAL_GAMMA: float = 2.0
    FOCAL_WEIGHT: float = 0.0
    EDGE_LOSS_WEIGHT: float = 0.0
    CONNECTIVITY_LOSS_WEIGHT: float = 0.0


@dataclass
class OptimizerConfig:
    """Mirrors OPTIMIZER.* (/root/reference/src/configs/config.py:70-74)."""

    NAME: str = "Adam"
    LR_SCHEDULER: str = "ReduceLROnPlateau"
    SCHEDULER_PATIENCE: int = 5
    SCHEDULER_FACTOR: float = 0.5
    # CosineAnnealingWarmRestarts params (unet_text_watermark.yaml:73-78)
    SCHEDULER_T_0: int = 50
    SCHEDULER_T_MULT: int = 2
    SCHEDULER_ETA_MIN: float = 1e-6


@dataclass
class PredictConfig:
    """Mirrors PREDICT.* (/root/reference/src/configs/config.py:77-84)."""

    INPUT_PATH: str = "data/input"
    OUTPUT_DIR: str = "data/output"
    BATCH_SIZE: int = 8
    AUTO_BATCH_SIZE: bool = True
    MAX_BATCH_SIZE: int = 32
    THRESHOLD: float = 0.5
    POST_PROCESS: bool = True
    # text-config extras (unet_text_watermark.yaml:81-94)
    TEXT_MODE: bool = False
    MULTI_SCALE_TEST: bool = False
    TEST_SCALES: List[float] = field(default_factory=lambda: [0.8, 1.0, 1.2])
    EDGE_REFINEMENT: bool = False
    CONNECTIVITY_CHECK: bool = False
    # TPU-specific: tiled sliding-window inference for high-res inputs
    TILED: bool = False
    TILE_SIZE: int = 512
    TILE_OVERLAP: int = 64
    # trained FFC-LaMa weights for the repair engines; None = auto-resolve
    # (env PREDICT_INPAINT_WEIGHTS, then the shipped models/lama_ffc)
    INPAINT_WEIGHTS: Optional[str] = None
    # int8 PTQ inference tier (ops/quant.py): convs run s8xs8->s32 on the
    # MXU using the calibrated <weights>.quant.json sidecar (generate with
    # scripts/calibrate_quant.py). Falls back to bf16 with a warning when
    # no sidecar exists for the resolved weights.
    QUANT: bool = False
    # mask-optimization mode: "parity" = the reference's cv2 chain
    # (/root/reference/src/predict.py:231-272, over-covering by design),
    # "tight" = precision-preserving chain that keeps multi-component
    # marks (inference/maskproc.optimize_watermark_mask_tight; measured
    # on the frozen protocol in docs/QUALITY.md), "auto" = parity for
    # mask ARTIFACTS (behavioral parity with the reference's outputs)
    # but tight for the REPAIR path — round-5 measurement: the parity
    # chain's over-coverage repaints clean texture and lands repair
    # below the no-op floor on natural-statistics content (QUALITY.md
    # textured e2e table), while tight holds both tiers.
    MASK_MODE: str = "auto"


@dataclass
class ValConfig:
    """Mirrors VAL.* (/root/reference/src/configs/config.py:87)."""

    METRICS: List[str] = field(default_factory=lambda: ["dice", "iou", "accuracy"])
    TEXT_METRICS: bool = False
    CHAR_LEVEL_EVAL: bool = False
    EDGE_ACCURACY: bool = False


@dataclass
class TextWatermarkConfig:
    """Mirrors TEXT_WATERMARK.* (unet_text_watermark.yaml:97-127)."""

    MIN_TEXT_AREA: int = 50
    MAX_TEXT_AREA: int = 10000
    TEXT_ASPECT_RATIO_MIN: float = 0.2
    TEXT_ASPECT_RATIO_MAX: float = 10.0
    MORPH_KERNEL_SIZE: int = 3
    DILATE_ITERATIONS: int = 1
    ERODE_ITERATIONS: int = 1
    CONNECTIVITY: int = 8
    MIN_COMPONENT_AREA: int = 30
    CLAHE_CLIP_LIMIT: float = 2.5
    CLAHE_TILE_SIZE: int = 8
    CANNY_LOW_THRESHOLD: int = 40
    CANNY_HIGH_THRESHOLD: int = 120
    SHARPEN_STRENGTH: float = 1.2


@dataclass
class ParallelConfig:
    """TPU parallelism — no reference counterpart (SURVEY.md §2.2: the
    reference's only parallelism is optional nn.DataParallel,
    /root/reference/src/utils/optimization_manager.py:240-245)."""

    MESH_SHAPE: Optional[List[int]] = None   # None → all devices on "data"
    MESH_AXES: List[str] = field(default_factory=lambda: ["data"])
    DATA_AXIS: str = "data"
    SPATIAL_AXIS: Optional[str] = None       # set to enable spatial sharding
    SPATIAL_HALO: int = 32                   # halo width for spatial conv sharding


@dataclass
class Config:
    """Root config. DEVICE mirrors /root/reference/src/configs/config.py:11;
    on this framework it selects the JAX platform ("tpu", "cpu")."""

    DEVICE: str = "tpu"
    MODEL: ModelConfig = field(default_factory=ModelConfig)
    DATA: DataConfig = field(default_factory=DataConfig)
    TRAIN: TrainConfig = field(default_factory=TrainConfig)
    LOSS: LossConfig = field(default_factory=LossConfig)
    OPTIMIZER: OptimizerConfig = field(default_factory=OptimizerConfig)
    PREDICT: PredictConfig = field(default_factory=PredictConfig)
    VAL: ValConfig = field(default_factory=ValConfig)
    TEXT_WATERMARK: TextWatermarkConfig = field(default_factory=TextWatermarkConfig)
    PARALLEL: ParallelConfig = field(default_factory=ParallelConfig)

    # ---- dict/YAML round-trip -------------------------------------------------
    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_yaml(self, path: Optional[str] = None) -> str:
        text = yaml.safe_dump(self.to_dict(), sort_keys=False)
        if path:
            with open(path, "w") as f:
                f.write(text)
        return text

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    def clone(self) -> "Config":
        return _from_dict(Config, self.to_dict())

    def merge_from_dict(self, d: Dict[str, Any]) -> "Config":
        _merge_into(self, d)
        return self

    def merge_from_file(self, path: str) -> "Config":
        with open(path) as f:
            d = yaml.safe_load(f) or {}
        return self.merge_from_dict(d)

    def merge_from_list(self, opts: List[str]) -> "Config":
        """YACS-style pairwise override list: ["TRAIN.LR", "0.001", ...]."""
        if len(opts) % 2 != 0:
            raise ValueError(f"override list must have even length, got {opts}")
        for key, value in zip(opts[::2], opts[1::2]):
            self.set_by_path(key, value)
        return self

    # ---- dotted-path access ---------------------------------------------------
    def get_by_path(self, path: str) -> Any:
        node: Any = self
        for part in path.split("."):
            node = getattr(node, part)
        return node

    def set_by_path(self, path: str, value: Any) -> None:
        parts = path.split(".")
        node: Any = self
        for part in parts[:-1]:
            node = getattr(node, part)
        leaf = parts[-1]
        if not hasattr(node, leaf):
            raise AttributeError(f"unknown config key: {path}")
        current = getattr(node, leaf)
        setattr(node, leaf, _coerce(value, current))


def _coerce(value: Any, current: Any) -> Any:
    """Coerce a (possibly string) override to the type of the current value."""
    if isinstance(value, str):
        try:
            value = yaml.safe_load(value)
        except yaml.YAMLError:
            pass
    if current is None or value is None:
        return value
    if isinstance(current, bool):
        if isinstance(value, str):
            return value.strip().lower() in ("1", "true", "yes", "on")
        return bool(value)
    if isinstance(current, int) and not isinstance(current, bool):
        return int(value)
    if isinstance(current, float):
        return float(value)
    if isinstance(current, list) and not isinstance(value, list):
        raise TypeError(f"expected list for override, got {value!r}")
    return value


def _merge_into(node: Any, d: Dict[str, Any]) -> None:
    for key, value in d.items():
        if not hasattr(node, key):
            # Tolerate unknown YAML sections/keys (the reference YAMLs carry
            # comments-as-keys in some variants); store them for inspection.
            continue
        current = getattr(node, key)
        if is_dataclass(current) and isinstance(value, dict):
            _merge_into(current, value)
        else:
            setattr(node, key, _coerce(value, current))


def _from_dict(cls, d: Dict[str, Any]):
    kwargs = {}
    for f in fields(cls):
        if f.name not in d:
            continue
        value = d[f.name]
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else f.default  # type: ignore
        if is_dataclass(default) and isinstance(value, dict):
            kwargs[f.name] = _from_dict(type(default), value)
        else:
            kwargs[f.name] = value
    return cls(**kwargs)


def get_cfg_defaults() -> Config:
    """Drop-in analog of /root/reference/src/configs/config.py:88."""
    return Config()


def update_config(cfg: Config, config_file: str) -> Config:
    """Drop-in analog of /root/reference/src/configs/config.py:92."""
    return cfg.merge_from_file(config_file)
