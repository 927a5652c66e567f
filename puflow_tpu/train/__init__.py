"""Training: loss composition, optimizer, sharded train step, plateau LR."""

from puflow_tpu.train.trainer import (
    TrainConfig,
    Trainer,
    make_optimizer,
    make_train_step,
)

__all__ = ["TrainConfig", "Trainer", "make_optimizer", "make_train_step"]
