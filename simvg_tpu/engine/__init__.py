from .train_state import (
    TrainState,
    create_optimizer,
    create_train_state,
    multistep_lr_warmup,
    ema_update,
)
from .train import make_train_step

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "multistep_lr_warmup",
    "ema_update",
    "make_train_step",
]
