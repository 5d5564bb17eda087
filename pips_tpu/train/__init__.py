from pips_tpu.train.config import TrainConfig
from pips_tpu.train.optim import make_optimizer, onecycle_linear
from pips_tpu.train.step import TrainState, make_train_step, train_loss_fn

__all__ = ["TrainConfig", "TrainState", "make_optimizer", "make_train_step",
           "onecycle_linear", "train_loss_fn"]
