from vit_ae_plus_plus_tpu.train.objective import mae_loss_terms
from vit_ae_plus_plus_tpu.train.optim import (
    warmup_cosine_schedule,
    make_adamw,
    layerwise_lr_decay_mask,
    make_lars,
)
from vit_ae_plus_plus_tpu.train.state import TrainState, create_train_state
from vit_ae_plus_plus_tpu.train.step import make_train_step, make_eval_step

__all__ = [
    "mae_loss_terms",
    "warmup_cosine_schedule",
    "make_adamw",
    "layerwise_lr_decay_mask",
    "make_lars",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
