from .state import EarlyStopping, LRScheduler, TrainState, make_optimizer
from .train import (
    create_train_state,
    make_eval_step,
    make_train_step,
    run_eval_epoch,
    run_train_epoch,
    save_training_plots,
    train,
)
from .checkpoint import (
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = [
    "EarlyStopping",
    "LRScheduler",
    "TrainState",
    "make_optimizer",
    "create_train_state",
    "make_eval_step",
    "make_train_step",
    "run_eval_epoch",
    "run_train_epoch",
    "save_training_plots",
    "train",
    "latest_checkpoint",
    "restore_checkpoint",
    "save_checkpoint",
]
