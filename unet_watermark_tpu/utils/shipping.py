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

import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger(__name__)


def seg_weights_filename(cfg) -> str:
    """Canonical shipped-weights filename for a segmentation config —
    shared by the trainer's export and the predictor's default lookup.
    The model name is canonicalized through the factory's alias map so a
    config saying NAME: unet++ finds seg_unetplusplus_<enc>.npz."""
    from ..models.factory import canonical_model_name

    try:
        name = canonical_model_name(cfg.MODEL.NAME).lower()
    except ValueError:
        name = cfg.MODEL.NAME.lower().replace("+", "p")
    return f"seg_{name}_{cfg.MODEL.ENCODER_NAME.lower()}.npz"


# ---------------------------------------------------------------------------
# unified weight registry — ONE resolver for every shipped-weights kind
# (the reference has no equivalent: it downloads LaMa at runtime and
# assumes user-supplied .pth files, /root/reference/src/predict.py:68,771)
# ---------------------------------------------------------------------------

def weights_dir() -> str:
    """The tracked shipped-weights directory: unet_watermark_tpu/weights."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(pkg, "weights")


def _repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))


# kind → (env var, cfg attr under PREDICT, shipped filename fn,
#         legacy fallback paths)
_KINDS = {
    "seg": ("PREDICT_SEG_WEIGHTS", "SEG_WEIGHTS",
            seg_weights_filename, ()),
    "inpaint": ("PREDICT_INPAINT_WEIGHTS", "INPAINT_WEIGHTS",
                lambda cfg: "lama_ffc.npz",
                ("weights:lama_ffc", "repo:models/lama_ffc")),
    "diffusion": ("DIFFUSION_WEIGHTS", "DIFFUSION_WEIGHTS",
                  lambda cfg: "latent_diffusion.npz",
                  ("repo:models/latent_diffusion",)),
}


def resolve(kind: str, cfg=None, explicit: Optional[str] = None,
            ) -> Optional[str]:
    """Resolve the weights path for `kind` in {seg, inpaint, diffusion}.

    Precedence: explicit arg > cfg.PREDICT.<attr> > env var > shipped
    file under unet_watermark_tpu/weights/ > legacy locations. Explicit /
    cfg / env values are returned verbatim (caller errors surface);
    defaults are returned only if they exist on disk. Returns None when
    nothing is found."""
    if kind not in _KINDS:
        raise ValueError(f"unknown weights kind '{kind}' "
                         f"(know {sorted(_KINDS)})")
    env_var, cfg_attr, filename_fn, legacy = _KINDS[kind]
    cfg_val = getattr(getattr(cfg, "PREDICT", None), cfg_attr, None)
    for cand in (explicit, cfg_val, os.environ.get(env_var)):
        if cand:
            return cand
    cands = [os.path.join(weights_dir(), filename_fn(cfg))] if (
        cfg is not None or kind != "seg") else []
    for spec in legacy:
        base, _, rel = spec.partition(":")
        root = weights_dir() if base == "weights" else _repo_root()
        cands.append(os.path.join(root, *rel.split("/")))
    for path in cands:
        if os.path.exists(path):
            return path
    return None


def load_variables(path: str, template: Any) -> Any:
    """Format-agnostic weight loading into `template`'s structure:
    a .npz file goes through load_params_npz (the bf16 distribution
    format); a training checkpoint directory (containing `tree/`, as
    written by training/checkpoint.save_checkpoint) is restored raw and
    filtered down to the template's top-level keys — the checkpoint also
    carries opt_state/step, which inference templates don't want; any
    other path is treated as a bare orbax pytree directory. This is the
    ONE loader every engine uses — predict, engines, and diffusion — so
    a path that resolves always loads the same way."""
    if os.path.isfile(path) and path.endswith(".npz"):
        return load_params_npz(path, template)
    if os.path.isdir(os.path.join(path, "tree")):
        from ..training.checkpoint import restore_raw

        tree, _ = restore_raw(path)
        if isinstance(template, dict):
            return {k: tree[k] for k in template if k in tree}
        return tree
    import orbax.checkpoint as ocp

    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(path), dict(template) if isinstance(template, dict)
        else template)
    return restored


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
        # jnp.issubdtype (not np.) so ml_dtypes bfloat16 leaves are
        # recognized as floating — np.issubdtype says False for bf16 and
        # a tree already holding bf16 would be written as raw void
        # entries that load_params_npz cannot read back.
        if jnp.issubdtype(v.dtype, jnp.floating) and dtype is not None:
            bv = np.asarray(jnp.asarray(v).astype(dtype))
            packed["BF16::" + k] = bv.view(np.uint16)
        else:
            packed[k] = v
    np.savez_compressed(path, **packed)
    return path


def load_params_npz(path: str, template: Any, partial: bool = False) -> Any:
    """Load a .npz written by save_params_npz back into `template`'s
    structure, casting each leaf to the template leaf's dtype. Raises
    KeyError if the stored keys do not cover the template — unless
    partial=True, which keeps the template leaf for any missing or
    shape-mismatched key (cross-architecture warm starts, e.g. seeding
    UnetTPU's resnet34 encoder from the shipped Unet checkpoint) and
    logs how much loaded."""
    data = np.load(path)
    stored = {}
    for k in data.files:
        if k.startswith("BF16::"):
            stored[k[6:]] = jnp.asarray(data[k]).view(jnp.bfloat16)
        else:
            stored[k] = jnp.asarray(data[k])
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    new_leaves = []
    n_loaded = 0
    for p, leaf in leaves_with_path:
        k = _keystr(p)
        if k not in stored or (partial
                               and stored[k].shape != leaf.shape):
            if not partial:
                raise KeyError(f"missing weight '{k}' in {path}")
            new_leaves.append(leaf)
            continue
        v = stored[k]
        if v.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for '{k}': stored {v.shape} vs "
                f"template {leaf.shape}")
        new_leaves.append(v.astype(leaf.dtype))
        n_loaded += 1
    if partial:
        logger.info("partial load from %s: %d/%d leaves", path,
                    n_loaded, len(new_leaves))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
