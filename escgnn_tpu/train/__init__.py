from escgnn_tpu.train.loop import (
    TrainState,
    make_train_step,
    make_eval_step,
    PlateauScheduler,
    set_learning_rate,
)
from escgnn_tpu.train.cycles import (
    train_val_cycles,
    train_val_cycles_regression,
    train_val_cycles_regression_GC,
)

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "PlateauScheduler",
    "set_learning_rate",
    "train_val_cycles",
    "train_val_cycles_regression",
    "train_val_cycles_regression_GC",
]
