"""Spatial sharding with halo exchange — the image-domain analog of
sequence/context parallelism (SURVEY.md §2.2/§5).

The reference handles large inputs by downscaling to IMG_SIZE
(/root/reference/src/predict.py:599-625); this module processes images that
do not fit one chip by sharding rows across the mesh:

  * `halo_exchange` — pad each device's row-shard with its neighbors' edge
    rows over ICI (lax.ppermute inside shard_map)
  * `sharded_conv2d` — exact conv on an H-sharded NHWC array: exchange a
    (k//2)-row halo, conv VALID on the padded shard, keep the local rows.
    Composable: stacking these gives exact multi-layer convs with one
    exchange per layer.

For whole-UNet inference (receptive field ≳ the image), exact spatial
sharding would need image-sized halos, so the production path for big
images is tile parallelism with overlap blending
(inference/tiled.py:predict_tiled_sharded); these primitives serve
shallow/fully-conv stages (inpainting smoothing, mask morphology at 8k+
resolutions) where the receptive field is small and exactness matters.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array


def _exchange(x_local: Array, halo: int, axis_name: str) -> Array:
    """Inside shard_map: prepend/append `halo` rows from the neighboring
    shards (zero rows at the global boundary)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top = x_local[:, :halo]          # rows this shard sends DOWN
    bottom = x_local[:, -halo:]      # rows this shard sends UP

    # receive the shard above's bottom rows / the shard below's top rows
    from_above = jax.lax.ppermute(
        bottom, axis_name, [(i, (i + 1) % n) for i in range(n)])
    from_below = jax.lax.ppermute(
        top, axis_name, [(i, (i - 1) % n) for i in range(n)])

    zeros = jnp.zeros_like(top)
    from_above = jnp.where(idx == 0, zeros, from_above)
    from_below = jnp.where(idx == n - 1, zeros, from_below)
    return jnp.concatenate([from_above, x_local, from_below], axis=1)


def halo_exchange(x: Array, halo: int, mesh: Mesh,
                  axis_name: Optional[str] = None) -> Array:
    """(N, H, W, C) sharded on H → (N, H + 2*halo/shard, W, C) per shard,
    returned as a global array with the halos attached per shard.

    Mostly useful through sharded_conv2d; exposed for custom kernels.
    """
    axis_name = axis_name or mesh.axis_names[0]
    fn = jax.shard_map(
        lambda xl: _exchange(xl, halo, axis_name),
        mesh=mesh,
        in_specs=P(None, axis_name, None, None),
        out_specs=P(None, axis_name, None, None))
    return fn(x)


def sharded_conv2d(x: Array, kernel: Array, mesh: Mesh,
                   axis_name: Optional[str] = None) -> Array:
    """Exact 'SAME' NHWC conv on an H-sharded array with halo exchange.

    x: (N, H, W, C) with H divisible by the axis size; kernel: HWIO with
    odd spatial dims. Output has the same sharding as the input. Matches
    an unsharded lax conv bit-for-bit (fp32).
    """
    axis_name = axis_name or mesh.axis_names[0]
    kh, kw = kernel.shape[0], kernel.shape[1]
    halo = kh // 2

    def local(xl, k):
        padded = _exchange(xl, halo, axis_name) if halo else xl
        return jax.lax.conv_general_dilated(
            padded, k, (1, 1), [(0, 0), (kw // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis_name, None, None), P(None, None, None, None)),
        out_specs=P(None, axis_name, None, None))
    return fn(x, kernel)


def shard_spatial(x: Array, mesh: Mesh,
                  axis_name: Optional[str] = None) -> Array:
    """Place (N,H,W,C) with H sharded over the mesh axis."""
    axis_name = axis_name or mesh.axis_names[0]
    return jax.device_put(
        x, NamedSharding(mesh, P(None, axis_name, None, None)))
