"""Int8 post-training quantization (PTQ) for TPU inference.

TPU-native analog of the reference's quantized-backend variant — the
reference ships a nunchaku-quantized FLUX transformer as its fast tier
(/root/reference/src/flux/flux_process_nunchaku.py:23); here the
segmentation convs themselves run as s8 x s8 -> s32 on the MXU, which on
v5e executes int8 MACs at 2x the bf16 rate and halves activation HBM
traffic. Measured per-shape on the chip (experiments/exp_int8_conv2.py):
1.15-1.42x over bf16 across every conv in the flagship models, including
the lhs-dilated fused up-convs.

Scheme
  * weights: symmetric per-output-channel int8, scales derived in-graph
    from the fp32 params (no separate quantized checkpoint — the shipped
    npz stays the single weight artifact)
  * activations: symmetric per-tensor int8 with scales calibrated offline
    (scripts/calibrate_quant.py) and stored as a JSON sidecar next to the
    weights ({conv path: amax}); the quantize (cast+round+clip) is
    elementwise and fuses into the producing op's epilogue
  * accumulation: int32, dequantized to the model dtype in the conv
    epilogue with the fused (sx * sw[c]) factor

Mode is a trace-time contextvar: `with quant_int8(scales): model.apply(...)`
quantizes every conv that calls conv2d_maybe_quant with a known path;
`with quant_observe(store): ...` (eager only) records per-conv input
amax for calibration. The contextvar is read during tracing, so a quant
forward must be jitted inside the context manager (predict.py wraps it);
an un-entered context means the plain bf16 conv — zero cost when off.
"""
from __future__ import annotations

import contextlib
import contextvars
import dataclasses
import json
import os
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

_DN = ("NHWC", "HWIO", "NHWC")

# Smallest recordable activation amax — matches the quantize_activation
# floor. Calibration never emits a non-positive scale (the shipping gate
# asserts every sidecar scale > 0, tests/test_shipping.py).
MIN_AMAX = 1e-12


@dataclasses.dataclass
class QuantMode:
    kind: str                      # "observe" | "int8"
    scales: Dict[str, float]      # conv path -> input amax (calibrated)
    # paths seen during tracing that had no calibrated scale (int8 mode
    # falls back to the float conv for those and records them here)
    missing: Optional[set] = None
    # observe: clip statistic — 1.0 records the true amax; <1.0 records
    # that |x| quantile (PTQ outlier clipping, e.g. 0.999)
    quantile: float = 1.0


_MODE: contextvars.ContextVar[Optional[QuantMode]] = contextvars.ContextVar(
    "uwt_quant_mode", default=None)


def current_mode() -> Optional[QuantMode]:
    return _MODE.get()


@contextlib.contextmanager
def quant_int8(scales: Dict[str, float]):
    """Trace-time context: convs with a calibrated path run s8xs8->s32."""
    mode = QuantMode("int8", dict(scales), missing=set())
    token = _MODE.set(mode)
    try:
        yield mode
    finally:
        _MODE.reset(token)


@contextlib.contextmanager
def quant_observe(store: Dict[str, float], quantile: float = 1.0):
    """Eager-only context: records per-conv input amax (or, with
    quantile < 1, that |x| quantile — standard PTQ outlier clipping)
    into `store`, keeping the max across batches.

    Run the forward UNJITTED (concrete arrays) — observation calls
    float() on traced statistics.
    """
    mode = QuantMode("observe", store, quantile=quantile)
    token = _MODE.set(mode)
    try:
        yield mode
    finally:
        _MODE.reset(token)


def quantize_weight(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Symmetric per-output-channel int8: returns (w_int8, scale[Cout])."""
    wf = w.astype(jnp.float32)
    sw = jnp.max(jnp.abs(wf), axis=tuple(range(wf.ndim - 1))) / 127.0
    sw = jnp.maximum(sw, 1e-12)
    wq = jnp.clip(jnp.round(wf / sw), -127.0, 127.0).astype(jnp.int8)
    return wq, sw


def quantize_activation(x: jax.Array, amax: float) -> Tuple[jax.Array, float]:
    """Symmetric per-tensor int8 with a calibrated amax."""
    sx = max(float(amax), MIN_AMAX) / 127.0
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / sx)),
                  -127.0, 127.0).astype(jnp.int8)
    return xq, sx


def conv2d_maybe_quant(x: jax.Array, w: jax.Array, *,
                       strides: Sequence[int] = (1, 1),
                       padding: Any = [(1, 1), (1, 1)],
                       lhs_dilation: Optional[Sequence[int]] = None,
                       path: str = "") -> jax.Array:
    """NHWC conv that runs int8 on the MXU when a quant context is active.

    `path` is the module-scope path of the conv ("encoder/layer1_0/conv1"),
    the key for its calibrated activation scale. Convs without a path or
    without a calibrated scale run the plain float conv unchanged.
    """
    mode = _MODE.get()
    if mode is None or not path:
        return lax.conv_general_dilated(
            x, w, tuple(strides), padding, lhs_dilation=lhs_dilation,
            dimension_numbers=_DN)
    if mode.kind == "observe":
        ax = jnp.abs(x)
        if mode.quantile >= 1.0:
            amax = float(jnp.max(ax))
        else:
            amax = float(jnp.quantile(
                ax.ravel().astype(jnp.float32), mode.quantile))
        # Floor at the runtime's own amax floor (quantize_activation):
        # a conv operand that is identically zero on the calibration set
        # (UNet++ trains some intermediate dense-skip nodes structurally
        # dead — post-BN+ReLU output 0 under inference batch_stats) must
        # still record a positive scale so the sidecar stays uniformly
        # loadable; quantizing a dead operand with a tiny scale yields
        # the same all-zero output as the float conv.
        mode.scales[path] = max(mode.scales.get(path, 0.0), amax, MIN_AMAX)
        return lax.conv_general_dilated(
            x, w, tuple(strides), padding, lhs_dilation=lhs_dilation,
            dimension_numbers=_DN)
    amax = mode.scales.get(path)
    if amax is None or amax <= 0.0:
        if mode.missing is not None:
            mode.missing.add(path)
        return lax.conv_general_dilated(
            x, w, tuple(strides), padding, lhs_dilation=lhs_dilation,
            dimension_numbers=_DN)
    xq, sx = quantize_activation(x, amax)
    wq, sw = quantize_weight(w)
    y = lax.conv_general_dilated(
        xq, wq, tuple(strides), padding, lhs_dilation=lhs_dilation,
        dimension_numbers=_DN, preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * (sx * sw)).astype(x.dtype)


def module_path(module) -> str:
    """Flax module scope path as a stable string key."""
    try:
        return "/".join(str(p) for p in module.path)
    except Exception:  # noqa: BLE001 — older flax: go through the scope
        scope = getattr(module, "scope", None)
        if scope is not None and getattr(scope, "path", None) is not None:
            return "/".join(str(p) for p in scope.path)
        return ""


class QConv(nn.Module):
    """Drop-in nn.Conv(use_bias=False-compatible) that routes through
    conv2d_maybe_quant. Parameter tree ("kernel" [kh,kw,Cin,Cout] fp32,
    optional "bias") matches nn.Conv so checkpoints interchange."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "SAME"
    use_bias: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (kh, kw, x.shape[-1], self.features),
                            jnp.float32)
        y = conv2d_maybe_quant(
            x.astype(self.dtype), kernel.astype(self.dtype),
            strides=self.strides, padding=self.padding,
            path=module_path(self))
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(y.dtype)
        return y


def save_scales(path: str, scales: Dict[str, float],
                meta: Optional[Dict[str, str]] = None) -> None:
    """Write the calibration sidecar. `meta` entries land under
    "__"-prefixed keys (e.g. __weights_sha256__ binds the sidecar to the
    exact checkpoint it was calibrated for — round 3's red gate was a
    sidecar/checkpoint mismatch; scripts/ship_gate.py enforces it)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    out: Dict[str, Any] = dict(sorted(scales.items()))
    for k, v in (meta or {}).items():
        out[f"__{k.strip('_')}__"] = v
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


def load_scales(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {str(k): float(v) for k, v in json.load(f).items()
                if not str(k).startswith("__")}


def load_sidecar_meta(path: str) -> Dict[str, str]:
    """The "__"-prefixed metadata entries of a calibration sidecar
    (empty for pre-round-5 sidecars)."""
    with open(path) as f:
        return {str(k).strip("_"): str(v) for k, v in json.load(f).items()
                if str(k).startswith("__")}
