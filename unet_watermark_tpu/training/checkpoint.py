"""Checkpoint save/restore: Orbax pytrees + JSON sidecar + .pth interop.

The reference checkpoints torch dicts with model/optimizer/scheduler state,
epoch, best_val_loss, full metric history and the frozen config
(/root/reference/src/train.py:425-460), restores all of it on resume
(:310-360), and predict loads both new-style dicts and bare state_dicts
(/root/reference/src/predict.py:80-91). Here:

  * device pytrees (params, batch_stats, opt_state) → Orbax
  * host state (epoch, history, scheduler, early-stopping, config)
    → meta.json sidecar
  * `.pth` export/import for drop-in compatibility goes through
    models/torch_import.py (BASELINE.json "drop-in .pth loading")
"""
from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)

CKPT_RE = re.compile(r"^checkpoint_epoch_(\d+)$")


def _abspath(p: str) -> str:
    return os.path.abspath(os.path.expanduser(p))


def save_checkpoint(directory: str, name: str, state, meta: Dict[str, Any]
                    ) -> str:
    """Save {params,batch_stats,opt_state} + meta.json under directory/name."""
    path = _abspath(os.path.join(directory, name))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    pytree = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "step": state.step,
    }
    # slim (inference-grade) snapshots carry no optimizer state — the
    # reference's best-model file is likewise a slimmer dict than its
    # periodic checkpoints (/root/reference/src/train.py:428-435)
    if state.opt_state is not None:
        pytree["opt_state"] = state.opt_state
    ckptr = ocp.StandardCheckpointer()
    tree_path = os.path.join(path, "tree")
    if os.path.exists(tree_path):
        import shutil
        shutil.rmtree(tree_path)
    ckptr.save(tree_path, pytree)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2, default=_json_default)
    return path


def restore_checkpoint(path: str, state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into the shape of `state`; returns (new_state, meta)."""
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    try:
        restored = ckptr.restore(os.path.join(path, "tree"), template)
        new_state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            opt_state=restored["opt_state"], step=restored["step"])
    except Exception as e:  # noqa: BLE001
        # optimizer mismatch between the checkpoint and the current config:
        # keep params/batch_stats, start the optimizer state fresh
        logger.warning(
            "full state restore failed (%s); restoring params/batch_stats "
            "only with a fresh optimizer state", str(e).splitlines()[0])
        tree = ckptr.restore(os.path.join(path, "tree"))
        new_state = state.replace(
            params=jax.tree_util.tree_map(
                lambda t, s: np.asarray(t, dtype=np.asarray(s).dtype),
                tree["params"], state.params),
            batch_stats=jax.tree_util.tree_map(
                lambda t, s: np.asarray(t, dtype=np.asarray(s).dtype),
                tree.get("batch_stats", {}), state.batch_stats),
            opt_state=state.tx.init(jax.tree_util.tree_map(
                jnp_asarray, tree["params"])),
            step=jnp_asarray(tree.get("step", 0)))
    return new_state, meta


def jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


def restore_raw(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Restore a checkpoint WITHOUT a template: returns (tree, meta) with
    numpy leaves. Use when only params/batch_stats are needed (model
    selection, inference) — a template-based restore couples the reader
    to the exact optimizer that produced the checkpoint, which breaks as
    soon as OPTIMIZER.NAME differs between runs."""
    path = _abspath(path)
    ckptr = ocp.StandardCheckpointer()
    tree = ckptr.restore(os.path.join(path, "tree"))
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return tree, meta


def latest_checkpoint(directory: str) -> Optional[str]:
    directory = _abspath(directory)
    if not os.path.isdir(directory):
        return None
    best = None
    best_epoch = -1
    for d in os.listdir(directory):
        m = CKPT_RE.match(d)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(directory, d)
    return best


def _json_default(o):
    if isinstance(o, (np.floating, np.integer)):
        return o.item()
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, jax.Array):
        return np.asarray(o).tolist()
    raise TypeError(f"not JSON serializable: {type(o)}")
