from .state import (
    TrainState,
    create_optimizer,
    create_train_state,
    stage2_lr_schedule,
    trainable_mask,
)
from .checkpoint import CheckpointManager
from .trainer import make_eval_step, make_grad_accum_steps, make_train_step

__all__ = [
    "TrainState",
    "create_optimizer",
    "create_train_state",
    "stage2_lr_schedule",
    "trainable_mask",
    "CheckpointManager",
    "make_train_step",
    "make_grad_accum_steps",
    "make_eval_step",
]
