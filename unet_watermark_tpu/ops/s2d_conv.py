"""Space-to-depth (phase-space) convolutions — exact, but an opt-in.

Motivation — measured on TPU v5e with the in-graph chained-loop harness
(workspace/exp_loop.py, docs/PERFORMANCE.md):

    3x3 conv 128ch -> 128ch : 185-192 TFLOP/s  (94-97% of bf16 peak)
    3x3 conv  32ch ->  32ch :      12 TFLOP/s  ( 6% of peak)
    3x3 conv  16ch ->  16ch :       8 TFLOP/s  ( 4% of peak)

XLA pads BOTH conv channel dimensions to the MXU's 128 lanes, so a
thin-channel conv executes (128/Cin)x(128/Cout) more MACs than needed.
Evaluating those convs in *phase space* avoids that: a shifted
space-to-depth by 2 turns [H, W, C] into [H/2+1, W/2+1, 4C]; a stride-1
3x3 conv becomes an exact 2x2 conv there (sparse weight transform), and
a nearest-up2x+3x3 "up-conv" an exact 2x2 conv producing all 16 output
phases at once. MAC inflation is 16/9 (3x3) and 4x (up-conv) — far
below the 10-16x padding waste replaced.

VERDICT (full-model A/B on the real chip, workspace/exp_ab_s2d.py):
the executed-MAC model does NOT predict wall-clock — s2d LOSES ~2.5x
on the flagship UNet++ @512² (173/202/461 img/s vs direct's
457/471/1162 at batch 32/64/128). The pad+reshape+transpose pair
around every conv is pure HBM traffic on tensors whose convs are
already bandwidth-bound, and the runtime weight expansion adds more.
"auto" therefore lowers direct (models/unet.py:smart_conv3x3); this
module stays as an explicit `lowering="s2d"` opt-in, exact to float
tolerance (tests/test_s2d_conv.py) — a worked, measured negative
result that documents why the thin-channel cliff is bandwidth, not
lanes, at large batch.

Derivation (rows; columns are identical):
  X2'[I, (a, ci)] = x[2I-1+a]  (zero-padded at -1 and H; H/2+1 groups)
  3x3:  out[2I+A] taps x[2I+A+dy], dy in [-1,1]
        => W2[P, (a,ci), (A,co)] = w3[2P+a-A] when 2P+a-A in [0,3)
  up:   out[u] = conv3x3(nearest_up2(x)) == lhs-dilated conv with the 4x4
        kernel K4 (models/unet.py:fuse_up_kernel); out[4I+r] taps K4 row
        m = 4P+2a-r at X2' slot (P,a) when m in [0,4)
        => W4[P, (a,ci), (r,co)] = K4[4P+2a-r]
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

# Experiment/debug override for every smart_conv3x3/smart_up_conv call
# site: "" (respect per-module setting), "direct", or "s2d". Read at
# trace time — set before jitting (e.g. in an A/B benchmark subprocess).
LOWERING_OVERRIDE = os.environ.get("UWT_CONV_LOWERING", "")


def s2d_shifted(x: jax.Array) -> jax.Array:
    """[N,H,W,C] -> [N,H/2+1,W/2+1,4C] with X2'[I,J,(a,b,c)] =
    x[2I-1+a, 2J-1+b, c], zero-padded out of range. H, W must be even."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    hh, ww = h // 2 + 1, w // 2 + 1
    xp = xp.reshape(n, hh, 2, ww, 2, c)
    return xp.transpose(0, 1, 3, 2, 4, 5).reshape(n, hh, ww, 4 * c)


def _d2s(y: jax.Array, f: int) -> jax.Array:
    """[N,H,W,f*f*C] -> [N,f*H,f*W,C] phase unpack ((r,s,c) minor order)."""
    n, h, w, cf = y.shape
    c = cf // (f * f)
    y = y.reshape(n, h, w, f, f, c)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(n, f * h, f * w, c)


def w2_from_w3(w3: jax.Array) -> jax.Array:
    """[3,3,ci,co] -> [2,2,4ci,4co] phase-space kernel for a stride-1
    SAME 3x3 conv: W2[P,Q,(a,b,ci),(A,B,co)] = w3[2P+a-A, 2Q+b-B]."""
    ci, co = w3.shape[2], w3.shape[3]
    w2 = jnp.zeros((2, 2, 2, 2, ci, 2, 2, co), w3.dtype)
    for P in (0, 1):
        for a in (0, 1):
            for A in (0, 1):
                r = 2 * P + a - A
                if not 0 <= r < 3:
                    continue
                for Q in (0, 1):
                    for b in (0, 1):
                        for B in (0, 1):
                            s = 2 * Q + b - B
                            if 0 <= s < 3:
                                w2 = w2.at[P, Q, a, b, :, A, B, :].set(
                                    w3[r, s])
    return w2.reshape(2, 2, 4 * ci, 4 * co)


def w4_from_k4(k4: jax.Array) -> jax.Array:
    """[4,4,ci,co] fused up-kernel -> [2,2,4ci,16co] phase-space kernel:
    W4[P,Q,(a,b,ci),(r,s,co)] = k4[4P+2a-r, 4Q+2b-s]."""
    ci, co = k4.shape[2], k4.shape[3]
    w4 = jnp.zeros((2, 2, 2, 2, ci, 4, 4, co), k4.dtype)
    for P in (0, 1):
        for a in (0, 1):
            for r in range(4):
                m = 4 * P + 2 * a - r
                if not 0 <= m < 4:
                    continue
                for Q in (0, 1):
                    for b in (0, 1):
                        for s in range(4):
                            mm = 4 * Q + 2 * b - s
                            if 0 <= mm < 4:
                                w4 = w4.at[P, Q, a, b, :, r, s, :].set(
                                    k4[m, mm])
    return w4.reshape(2, 2, 4 * ci, 16 * co)


def _conv_valid(x: jax.Array, w: jax.Array) -> jax.Array:
    return lax.conv_general_dilated(
        x, w, (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def s2d_conv3x3(x: jax.Array, w3: jax.Array) -> jax.Array:
    """Exact stride-1 SAME 3x3 conv, evaluated in phase space.
    x: [N,H,W,Ci] (H, W even); w3: [3,3,Ci,Co] -> [N,H,W,Co]."""
    y2 = _conv_valid(s2d_shifted(x), w2_from_w3(w3).astype(x.dtype))
    return _d2s(y2, 2)


def s2d_upconv3x3(x: jax.Array, k4: jax.Array) -> jax.Array:
    """Exact conv3x3(nearest_up2x(x), SAME), evaluated in phase space.
    x: [N,H,W,Ci] (H, W even); k4: [4,4,Ci,Co] fused up-kernel
    (models/unet.py:fuse_up_kernel) -> [N,2H,2W,Co]."""
    y4 = _conv_valid(s2d_shifted(x), w4_from_k4(k4).astype(x.dtype))
    return _d2s(y4, 4)


def _pad128(c: int) -> int:
    return max(128, -(-c // 128) * 128)


def s2d_conv_wins(ci: int, co: int) -> bool:
    """Executed-MAC model: direct 3x3 costs 9*P(ci)*P(co) per output
    pixel after XLA's 128-lane padding; phase space costs P(4ci)*P(4co).
    NOTE: predicts MACs only — falsified as a wall-clock predictor by
    the full-model A/B (module docstring); kept as documentation of
    the padding arithmetic."""
    return _pad128(4 * ci) * _pad128(4 * co) < 9 * _pad128(ci) * _pad128(co)


def s2d_upconv_wins(ci: int, co: int) -> bool:
    """Up-conv MAC model (same caveat as s2d_conv_wins): lhs-dilated
    direct ~ 9*P(ci)*P(co) per output pixel; phase space P(4ci)*P(16co)/4."""
    return _pad128(4 * ci) * _pad128(16 * co) < 4 * 9 * _pad128(ci) * _pad128(co)
