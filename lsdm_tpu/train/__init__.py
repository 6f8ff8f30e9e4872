"""Training stack: state, steps, loops, checkpoints."""

from lsdm_tpu.train.state import TrainState, create_train_state
from lsdm_tpu.train.trainer import make_train_step, make_eval_step, Trainer
