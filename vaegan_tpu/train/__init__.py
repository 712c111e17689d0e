from vaegan_tpu.train.optim import build_optimizer, torch_rmsprop
from vaegan_tpu.train.state import TrainState, build_models, create_train_state
from vaegan_tpu.train.step import make_paper_train_step, make_train_step

__all__ = [
    "TrainState", "build_models", "create_train_state",
    "make_train_step", "make_paper_train_step",
    "build_optimizer", "torch_rmsprop",
]
