from escgnn_tpu.train.loop import (
    TrainState,
    make_train_step,
    make_eval_step,
    PlateauScheduler,
    set_learning_rate,
)

__all__ = [
    "TrainState",
    "make_train_step",
    "make_eval_step",
    "PlateauScheduler",
    "set_learning_rate",
]
