from .state import TrainState
from .step import (
    build_optimizer,
    linear_warmup_decay_schedule,
    make_eval_step,
    make_lr_schedule,
    make_train_step,
)
