"""Train state + optimizer/scheduler factory.

Replaces the torch Adam/AdamW + GradScaler + torch.optim.lr_scheduler stack
(/root/reference/src/train.py:270-300,408-412) with optax. bf16 is native on
TPU so there is no GradScaler analog — the forward runs in bf16, the loss
and optimizer state in fp32 (SURVEY.md §2.1 "torch.cuda.amp → native bf16").

Scheduler semantics follow torch exactly, stepped once per epoch:
  * ReduceLROnPlateau (patience/factor, config.py:70-74)
  * CosineAnnealingWarmRestarts (T_0/T_mult/eta_min,
    unet_text_watermark.yaml:73-78)
  * StepLR / CosineAnnealing as extras
The learning rate lives in optax inject_hyperparams state so host-side
epoch updates don't recompile the jitted step.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)

    def apply_gradients(self, grads, new_batch_stats):
        updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            batch_stats=new_batch_stats,
                            opt_state=new_opt_state)

    # ---- lr access (host-side, epoch granularity) -------------------------
    def current_lr(self) -> float:
        return float(_find_hyperparams(self.opt_state)["learning_rate"])

    def with_lr(self, lr: float) -> "TrainState":
        opt_state = _set_hyperparam(self.opt_state, "learning_rate", lr)
        return self.replace(opt_state=opt_state)


def _find_hyperparams(opt_state):
    if hasattr(opt_state, "hyperparams"):
        return opt_state.hyperparams
    for leaf in opt_state:
        if hasattr(leaf, "hyperparams"):
            return leaf.hyperparams
    raise ValueError("optimizer state has no injected hyperparams")


def _set_hyperparam(opt_state, name, value):
    if hasattr(opt_state, "hyperparams"):
        hp = dict(opt_state.hyperparams)
        hp[name] = jnp.asarray(value, jnp.float32)
        return opt_state._replace(hyperparams=hp)
    new = []
    done = False
    for leaf in opt_state:
        if not done and hasattr(leaf, "hyperparams"):
            hp = dict(leaf.hyperparams)
            hp[name] = jnp.asarray(value, jnp.float32)
            leaf = leaf._replace(hyperparams=hp)
            done = True
        new.append(leaf)
    if not done:
        raise ValueError("optimizer state has no injected hyperparams")
    return type(opt_state)(new) if not isinstance(opt_state, tuple) \
        else tuple(new)


def make_optimizer(cfg) -> optax.GradientTransformation:
    """Adam/AdamW/SGD with gradient clipping — analog of the reference's
    optimizer construction (train.py:270-280) + GRADIENT_CLIP (:96)."""
    name = cfg.OPTIMIZER.NAME.lower()
    wd = cfg.TRAIN.WEIGHT_DECAY

    @optax.inject_hyperparams
    def make(learning_rate):
        if name == "adam":
            # torch Adam applies weight decay as L2 into the gradient
            base = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.scale_by_adam(),
                optax.scale_by_learning_rate(learning_rate),
            )
        elif name == "adamw":
            base = optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.scale_by_learning_rate(learning_rate),
            )
        elif name == "sgd":
            base = optax.chain(
                optax.add_decayed_weights(wd) if wd else optax.identity(),
                optax.trace(decay=0.9),
                optax.scale_by_learning_rate(learning_rate),
            )
        else:
            raise ValueError(f"unsupported optimizer '{cfg.OPTIMIZER.NAME}'")
        return base

    tx = make(learning_rate=cfg.TRAIN.LR)
    clip = cfg.TRAIN.GRADIENT_CLIP
    if clip and clip > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


class LRScheduler:
    """Epoch-stepped scheduler with torch semantics.

    step(epoch_val_loss) returns the new lr. ReduceLROnPlateau watches
    val_loss (min mode); others are pure functions of the epoch index.
    """

    def __init__(self, cfg, base_lr: Optional[float] = None):
        self.kind = cfg.OPTIMIZER.LR_SCHEDULER
        self.base_lr = base_lr if base_lr is not None else cfg.TRAIN.LR
        self.factor = cfg.OPTIMIZER.SCHEDULER_FACTOR
        self.patience = cfg.OPTIMIZER.SCHEDULER_PATIENCE
        self.t0 = cfg.OPTIMIZER.SCHEDULER_T_0
        self.t_mult = cfg.OPTIMIZER.SCHEDULER_T_MULT
        self.eta_min = cfg.OPTIMIZER.SCHEDULER_ETA_MIN
        self.epochs = cfg.TRAIN.EPOCHS
        self._lr = self.base_lr
        self._best = float("inf")
        self._bad_epochs = 0
        self._epoch = 0

    def step(self, val_loss: Optional[float] = None) -> float:
        self._epoch += 1
        kind = (self.kind or "").lower()
        if kind in ("", "none"):
            pass
        elif kind == "reducelronplateau":
            if val_loss is not None:
                if val_loss < self._best - 1e-8:
                    self._best = val_loss
                    self._bad_epochs = 0
                else:
                    self._bad_epochs += 1
                    if self._bad_epochs > self.patience:
                        self._lr *= self.factor
                        self._bad_epochs = 0
        elif kind == "cosineannealingwarmrestarts":
            # torch: T_i doubles by t_mult after each restart
            t_cur, t_i = self._epoch, self.t0
            while t_cur >= t_i:
                t_cur -= t_i
                t_i *= self.t_mult
            self._lr = (self.eta_min + (self.base_lr - self.eta_min) *
                        (1 + math.cos(math.pi * t_cur / t_i)) / 2)
        elif kind == "cosineannealing":
            self._lr = (self.eta_min + (self.base_lr - self.eta_min) *
                        (1 + math.cos(math.pi * self._epoch /
                                      max(self.epochs, 1))) / 2)
        elif kind == "steplr":
            if self._epoch % max(self.patience, 1) == 0:
                self._lr *= self.factor
        else:
            raise ValueError(f"unsupported scheduler '{self.kind}'")
        return self._lr

    def state_dict(self) -> Dict[str, Any]:
        return {"lr": self._lr, "best": self._best,
                "bad_epochs": self._bad_epochs, "epoch": self._epoch}

    def load_state_dict(self, d: Dict[str, Any]) -> None:
        self._lr = d["lr"]
        self._best = d["best"]
        self._bad_epochs = d["bad_epochs"]
        self._epoch = d["epoch"]


class EarlyStopping:
    """min-mode early stopping — analog of
    /root/reference/src/train.py:37-66."""

    def __init__(self, patience: int = 10, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def __call__(self, val_loss: float) -> bool:
        if self.best is None or val_loss < self.best - self.min_delta:
            self.best = val_loss
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop

    def state_dict(self):
        return {"best": self.best, "counter": self.counter,
                "should_stop": self.should_stop}

    def load_state_dict(self, d):
        self.best = d["best"]
        self.counter = d["counter"]
        self.should_stop = d["should_stop"]
