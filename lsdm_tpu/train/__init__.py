"""Training stack: state, steps, loops, checkpoints."""

from lsdm_tpu.train.state import TrainState, create_train_state
from lsdm_tpu.train.trainer import (
    Trainer,
    make_eval_step,
    make_scan_train_step,
    make_train_step,
)
