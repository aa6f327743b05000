"""Block-Toeplitz lane packing for thin-channel convs.

The decoder tail of both flagship models runs stride-1 3x3 convs at
16-32 output channels over 256²-512² feature maps. XLA's implicit GEMM
for those is [HW, 9·Cin] x [9·Cin, Cout] with Cout padded to the MXU's
128 lanes — at Cout=16 only 1/8 of every MXU pass does useful work
(docs/PERFORMANCE.md "Why a hand-written Pallas conv won't close the
UNet++ gap": the round-3 xplane trace pins the hot kernels on exactly
these stages).

The fix this module implements — the restructuring that analysis names
as the one that would win — packs P output *columns* into the lane dim:

    y[n, h, w0:w0+P, :Cout]  as one GEMM row of P·Cout lanes

by expanding the 3x3 kernel W into a block-Toeplitz weight

    W_bt[kh, kw', cin, j·Cout+co] = W[kh, kw'-j, cin, co]   (0 ≤ kw'-j < 3)

of window width P+2, applied with window_strides=(1, P). Each output
position of that conv computes all P packed columns — K grows to
3·(P+2)·Cin (480→512 padded at Cin=16, P=8) while N fills 128 lanes:
~6x fewer padded MXU slots than the direct conv's N̂=128 padding. The
[n, H, W/P, P·Cout] result reshapes back to [n, H, W, Cout] for free
(j-major packing, contiguous in the lane dim).

The same packing applies to the fused lhs-dilated up-convs
(models/unet.py fuse_up_kernel: 4x4 kernel, lhs_dilation=2): on the
2x-dilated grid the packed window is P+3 wide and the stride is P,
with the same (2,2) padding as the direct form.

Both forms route through ops/quant.conv2d_maybe_quant, so the int8 PTQ
tier gets the packing automatically: the activation is unchanged (same
per-tensor amax key) and the block-Toeplitz weight's per-output-channel
scales are exact replicas of the original Cout scales (each packed
channel j·Cout+co holds exactly the taps of channel co plus zeros).

Exactness is tested against the direct conv in tests/test_bt_conv.py;
the on-chip A/B lives in experiments/exp_bt_conv.py.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

# Trace-time override for A/B experiments: None (module default routing),
# "bt" (force packing), "direct" (force it off). Mirrors
# s2d_conv.LOWERING_OVERRIDE.
LOWERING_OVERRIDE: Optional[str] = None

# Whether lowering="auto" routes eligible convs through the packing.
# Set from the measured on-chip A/B (experiments/exp_bt_conv.py) — keep
# False until the full-model numbers prove a win, mirroring the s2d
# lesson (a transform that wins on the MAC model can lose on the chip).
AUTO_ENABLED = False

# Packing width: P·Cout should reach the MXU's 128 lanes for the 16-ch
# tail; 8 also keeps 512-wide rows evenly divisible.
PACK = 8

# choose_pack floor — experiments can raise it to restrict packing to
# the thinnest (largest-pack) convs only.
MIN_PACK = 4


def pack_kernel_conv3x3(w3: jax.Array, pack: int = PACK) -> jax.Array:
    """[3,3,Cin,Cout] -> block-Toeplitz [3, pack+2, Cin, pack*Cout]."""
    kh, kw, cin, cout = w3.shape
    wbt = jnp.zeros((kh, kw + pack - 1, cin, pack, cout), w3.dtype)
    for j in range(pack):
        wbt = wbt.at[:, j:j + kw, :, j, :].set(w3)
    return wbt.reshape(kh, kw + pack - 1, cin, pack * cout)


def pack_kernel_up4x4(k4: jax.Array, pack: int = PACK) -> jax.Array:
    """[4,4,Cin,Cout] fused-up kernel -> [4, pack+3, Cin, pack*Cout]."""
    return pack_kernel_conv3x3(k4, pack)  # same construction, kw=4


def bt_conv3x3(x: jax.Array, w3: jax.Array, pack: int = PACK,
               path: str = "") -> jax.Array:
    """Stride-1 SAME 3x3 conv with pack output columns per MXU row.

    Exact for any W divisible by `pack` (512/256/128-wide decoder maps
    all are). Falls back to caller-side direct conv for odd widths.
    """
    from .quant import conv2d_maybe_quant

    n, h, w, cin = x.shape
    assert w % pack == 0, f"width {w} not divisible by pack {pack}"
    cout = w3.shape[-1]
    wbt = pack_kernel_conv3x3(w3, pack)
    y = conv2d_maybe_quant(
        x, wbt, strides=(1, pack), padding=[(1, 1), (1, 1)], path=path)
    return y.reshape(n, h, w, cout)


def bt_upconv(x_low: jax.Array, k4: jax.Array, pack: int = PACK,
              path: str = "") -> jax.Array:
    """Fused up-conv (4x4 kernel, lhs_dilation=2, pad 2) with column
    packing on the dilated grid. Output is [n, 2h, 2w, Cout]."""
    from .quant import conv2d_maybe_quant

    n, h, w, cin = x_low.shape
    assert (2 * w) % pack == 0
    cout = k4.shape[-1]
    wbt = pack_kernel_up4x4(k4, pack)
    y = conv2d_maybe_quant(
        x_low, wbt, strides=(1, pack), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), path=path)
    return y.reshape(n, 2 * h, 2 * w, cout)


def choose_pack(cout: int, width: int) -> Optional[int]:
    """Packing width for lowering="auto": fill the MXU's 128 lanes
    exactly (pack = 128/Cout), only on the genuinely lane-starved tail
    (Cout ≤ 32, i.e. pack ≥ 4) and on rows wide enough to amortize the
    packed window's overlap reads. Returns None to run the direct conv.
    Thresholds validated on-chip in experiments/exp_bt_conv.py."""
    if width < 128 or cout > 32 or 128 % cout:
        return None
    pack = 128 // cout
    if pack < MIN_PACK:
        return None
    return pack if width % pack == 0 else None
