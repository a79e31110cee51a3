from convtasnet_tpu.train.train_step import TrainState, make_eval_step, make_train_step, make_optimizer  # noqa: F401
from convtasnet_tpu.train.solver import Solver  # noqa: F401
