"""Device mesh construction and sharding policy.

The reference's entire distributed story is optional nn.DataParallel over
local GPUs (/root/reference/src/utils/optimization_manager.py:240-245,
SURVEY.md §2.2). Here parallelism is a first-class design axis:

  * a named `jax.sharding.Mesh` over all addressable devices
  * batch (data) parallelism as the primary axis — inputs sharded on
    "data", params replicated, gradients psum'd by XLA under jit
  * optional spatial axis for sharding very large images across devices
    (the image-domain analog of sequence parallelism, SURVEY.md §5)

Everything goes through `jax.jit` with `NamedSharding` constraints; XLA
inserts the ICI collectives.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("data",),
              devices: Optional[Sequence] = None) -> Mesh:
    """Build a Mesh over the available devices.

    Defaults to a 1-D "data" mesh over all devices — the right layout for
    a ~24M-param conv net where DP is the only profitable axis on a v5e
    slice (params fit in every chip's HBM; grads all-reduce over ICI).
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = [len(devices)] + [1] * (len(axis_names) - 1)
    arr = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, tuple(axis_names))


def mesh_from_config(cfg) -> Mesh:
    return make_mesh(cfg.PARALLEL.MESH_SHAPE, tuple(cfg.PARALLEL.MESH_AXES))


def batch_sharding(mesh: Mesh, data_axis: str = "data",
                   spatial_axis: Optional[str] = None) -> NamedSharding:
    """NHWC batch sharded on the data axis (+optionally H on spatial)."""
    return NamedSharding(mesh, P(data_axis, spatial_axis, None, None))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, data_axis: str = "data"):
    """Place a host pytree of (N, ...) arrays onto the mesh, N sharded."""
    def put(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(put, batch)


def pad_batch_to(batch, n: int):
    """Pad leading dim to n (XLA static shapes; remainder batches).

    Returns (padded_batch, valid_mask) where valid_mask is (n,) float32 —
    1 for real samples, 0 for padding. Losses/metrics must be weighted by
    it so padding never leaks into training signal.
    """
    import numpy as np

    def pad(x):
        b = x.shape[0]
        if b == n:
            return x
        widths = [(0, n - b)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths)

    first = jax.tree_util.tree_leaves(batch)[0]
    b = first.shape[0]
    mask = np.zeros((n,), np.float32)
    mask[:b] = 1.0
    return jax.tree_util.tree_map(pad, batch), mask


def local_batch_size(global_batch: int, mesh: Mesh,
                     data_axis: str = "data") -> int:
    n = mesh.shape[data_axis]
    if global_batch % n:
        raise ValueError(
            f"global batch {global_batch} not divisible by data-parallel "
            f"size {n}")
    return global_batch // n
