from phasegen_tpu.train.losses import phase_mag_loss
from phasegen_tpu.train.state import TrainState, create_train_state
from phasegen_tpu.train.step import build_train_step, build_eval_step

__all__ = [
    "phase_mag_loss",
    "TrainState",
    "create_train_state",
    "build_train_step",
    "build_eval_step",
]
