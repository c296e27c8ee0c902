from llark_tpu.train.state import TrainState  # noqa: F401
from llark_tpu.train.step import make_optimizer, make_train_step  # noqa: F401
