from molnextr_tpu.train.losses import (
    Criterion,
    graph_loss,
    label_smoothing_ce,
    sequence_loss,
)
from molnextr_tpu.train.state import TrainState, create_train_state, make_schedules
from molnextr_tpu.train.step import eval_step_fn, train_step_fn

__all__ = [
    "Criterion",
    "graph_loss",
    "label_smoothing_ce",
    "sequence_loss",
    "TrainState",
    "create_train_state",
    "make_schedules",
    "train_step_fn",
    "eval_step_fn",
]
