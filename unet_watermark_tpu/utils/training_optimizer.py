"""Alternative training engine — analog of
/root/reference/src/utils/training_optimizer.py.

The reference ships a second, self-contained trainer with its own
TrainingConfig dataclass, warmup schedulers, gradient accumulation +
clipping, channels_last/compile toggles and JSON history (:25-772). The
TPU counterpart keeps the API but builds on the framework's jitted step:

  * warmup + cosine/step/plateau schedules as optax schedules
  * gradient accumulation via optax.MultiSteps (one jitted step per
    micro-batch; the optimizer applies every k steps) — replaces the
    hand-rolled loss/accum_steps loop (:393-411)
  * deterministic mode = fixed PRNG keys (XLA is already deterministic;
    no cudnn.deterministic analog needed)
  * history JSON export (:656-682)
"""
from __future__ import annotations

import dataclasses
import json
import logging
import os
import time
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainingConfig:
    """training_optimizer.py:25-94 analog."""

    learning_rate: float = 1e-3
    weight_decay: float = 1e-4
    optimizer: str = "adamw"          # adamw | adam | sgd
    scheduler: str = "cosine"         # cosine | step | plateau | none
    warmup_steps: int = 0
    total_steps: int = 10000
    step_decay_every: int = 1000
    step_decay_factor: float = 0.5
    min_lr: float = 1e-6
    gradient_clip: float = 1.0
    gradient_accumulation_steps: int = 1
    compute_dtype: str = "bfloat16"
    seed: int = 42
    early_stopping_patience: int = 10
    output_dir: str = "training_output"


def build_schedule(cfg: TrainingConfig) -> optax.Schedule:
    base = cfg.learning_rate
    if cfg.scheduler == "cosine":
        main = optax.cosine_decay_schedule(
            base, max(cfg.total_steps - cfg.warmup_steps, 1),
            alpha=cfg.min_lr / base)
    elif cfg.scheduler == "step":
        boundaries = {
            i * cfg.step_decay_every: cfg.step_decay_factor
            for i in range(1, max(cfg.total_steps //
                                  max(cfg.step_decay_every, 1), 1) + 1)}
        main = optax.piecewise_constant_schedule(base, boundaries)
    else:  # plateau handled at epoch level / none
        main = optax.constant_schedule(base)
    if cfg.warmup_steps > 0:
        warmup = optax.linear_schedule(0.0, base, cfg.warmup_steps)
        return optax.join_schedules([warmup, main], [cfg.warmup_steps])
    return main


def build_optimizer(cfg: TrainingConfig) -> optax.GradientTransformation:
    schedule = build_schedule(cfg)
    if cfg.optimizer == "adamw":
        tx = optax.adamw(schedule, weight_decay=cfg.weight_decay)
    elif cfg.optimizer == "adam":
        tx = optax.adam(schedule)
    elif cfg.optimizer == "sgd":
        tx = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"unknown optimizer {cfg.optimizer}")
    if cfg.gradient_clip and cfg.gradient_clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(cfg.gradient_clip), tx)
    if cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx


class TrainingOptimizer:
    """training_optimizer.py:201-726 analog: generic trainer over a flax
    module and a loss fn."""

    def __init__(self, model, loss_fn: Callable,
                 config: Optional[TrainingConfig] = None):
        self.model = model
        self.loss_fn = loss_fn
        self.config = config or TrainingConfig()
        self.tx = build_optimizer(self.config)
        self.history: Dict[str, List[float]] = {
            "train_loss": [], "val_loss": [], "lr": [], "epoch_time": []}
        self._step = None

    def init_state(self, example_batch) -> Dict[str, Any]:
        rng = jax.random.PRNGKey(self.config.seed)
        variables = self.model.init(rng, example_batch["image"], train=False)
        return {
            "params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "opt_state": self.tx.init(variables["params"]),
            "step": jnp.zeros((), jnp.int32),
        }

    def _make_step(self):
        loss_fn = self.loss_fn
        model = self.model
        tx = self.tx

        @jax.jit
        def step(state, batch):
            def loss_of(params):
                out, mutated = model.apply(
                    {"params": params,
                     "batch_stats": state["batch_stats"]},
                    batch["image"], train=True, mutable=["batch_stats"])
                return loss_fn(out, batch["mask"]), mutated["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state["params"])
            updates, new_opt = tx.update(grads, state["opt_state"],
                                         state["params"])
            new_params = optax.apply_updates(state["params"], updates)
            return {
                "params": new_params, "batch_stats": new_bs,
                "opt_state": new_opt, "step": state["step"] + 1,
            }, loss

        return step

    def train(self, batches_fn: Callable[[], Any], epochs: int,
              val_batches_fn: Optional[Callable[[], Any]] = None,
              state: Optional[Dict] = None) -> Dict[str, Any]:
        """batches_fn() yields dict batches with 'image'/'mask'."""
        if self._step is None:
            self._step = self._make_step()
        first = None
        best_val = float("inf")
        bad = 0
        for epoch in range(epochs):
            t0 = time.time()
            losses = []
            for batch in batches_fn():
                if state is None:
                    state = self.init_state(batch)
                state, loss = self._step(state, batch)
                losses.append(loss)
            train_loss = float(np.mean([np.asarray(l) for l in losses])) \
                if losses else float("nan")
            self.history["train_loss"].append(train_loss)
            self.history["epoch_time"].append(time.time() - t0)
            val_loss = float("nan")
            if val_batches_fn is not None:
                vl = []
                for batch in val_batches_fn():
                    out = self.model.apply(
                        {"params": state["params"],
                         "batch_stats": state["batch_stats"]},
                        batch["image"], train=False)
                    vl.append(float(self.loss_fn(out, batch["mask"])))
                val_loss = float(np.mean(vl)) if vl else float("nan")
            self.history["val_loss"].append(val_loss)
            logger.info("epoch %d: train=%.4f val=%.4f", epoch + 1,
                        train_loss, val_loss)
            if val_loss < best_val:
                best_val = val_loss
                bad = 0
            else:
                bad += 1
                if bad >= self.config.early_stopping_patience:
                    logger.info("early stop at epoch %d", epoch + 1)
                    break
        self.save_history()
        return {"state": state, "history": self.history,
                "best_val_loss": best_val}

    def save_history(self) -> str:
        os.makedirs(self.config.output_dir, exist_ok=True)
        path = os.path.join(self.config.output_dir,
                            "training_history.json")
        with open(path, "w") as f:
            json.dump(self.history, f, indent=2)
        return path
