from .train_state import (
    TrainState,
    create_optimizer,
    create_train_state,
    multistep_lr_warmup,
    ema_update,
)
from .train import make_train_step, make_eval_step
from .evaluate import evaluate
from . import metrics

__all__ = [
    "make_eval_step",
    "evaluate",
    "metrics",
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "multistep_lr_warmup",
    "ema_update",
    "make_train_step",
]
