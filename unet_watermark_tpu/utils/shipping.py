"""Compact weight shipping: pytree <-> bf16 .npz.

Orbax checkpoints (training/checkpoint.py) are the resume format; this is
the *distribution* format for weights committed into the repo — a single
.npz file with bf16 arrays (half the fp32 size), loadable without knowing
the tree structure ahead of time beyond a template.

The reference ships no weights at all (it downloads LaMa through iopaint
at runtime, /root/reference/src/predict.py:771); a zero-egress TPU pod
needs the weights in-repo.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def seg_weights_filename(cfg) -> str:
    """Canonical shipped-weights filename for a segmentation config —
    shared by the trainer's export and the predictor's default lookup."""
    return (f"seg_{cfg.MODEL.NAME.lower().replace('+', 'p')}_"
            f"{cfg.MODEL.ENCODER_NAME.lower()}.npz")


def _keystr(path) -> str:
    return "/".join(
        str(getattr(p, "key", getattr(p, "idx", p))) for p in path)


def flatten_tree(tree: Any) -> Dict[str, np.ndarray]:
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[_keystr(path)] = np.asarray(leaf)
    return out


def save_params_npz(path: str, tree: Any, dtype=jnp.bfloat16) -> str:
    """Save a pytree of arrays as one .npz; float arrays cast to `dtype`
    (bf16 is stored via a uint16 view — npz has no native bf16)."""
    flat = flatten_tree(tree)
    packed = {}
    for k, v in flat.items():
        if np.issubdtype(v.dtype, np.floating) and dtype is not None:
            bv = np.asarray(jnp.asarray(v).astype(dtype))
            packed["BF16::" + k] = bv.view(np.uint16)
        else:
            packed[k] = v
    np.savez_compressed(path, **packed)
    return path


def load_params_npz(path: str, template: Any) -> Any:
    """Load a .npz written by save_params_npz back into `template`'s
    structure, casting each leaf to the template leaf's dtype. Raises
    KeyError if the stored keys do not cover the template."""
    data = np.load(path)
    stored = {}
    for k in data.files:
        if k.startswith("BF16::"):
            stored[k[6:]] = jnp.asarray(data[k]).view(jnp.bfloat16)
        else:
            stored[k] = jnp.asarray(data[k])
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    for p, leaf in leaves_with_path:
        k = _keystr(p)
        if k not in stored:
            raise KeyError(f"missing weight '{k}' in {path}")
        v = stored[k]
        if v.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for '{k}': stored {v.shape} vs "
                f"template {leaf.shape}")
        new_leaves.append(v.astype(leaf.dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
