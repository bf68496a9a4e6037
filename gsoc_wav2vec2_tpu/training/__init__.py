from .state import (
    TrainState,
    create_optimizer,
    create_train_state,
    stage2_lr_schedule,
    trainable_mask,
)
from .trainer import make_eval_step, make_train_step

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "stage2_lr_schedule",
    "trainable_mask",
    "make_train_step",
    "make_eval_step",
]
