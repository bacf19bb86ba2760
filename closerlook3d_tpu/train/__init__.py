from closerlook3d_tpu.train.state import TrainState, create_train_state  # noqa: F401
from closerlook3d_tpu.train.step import make_train_step, make_eval_step  # noqa: F401
from closerlook3d_tpu.train.schedules import make_lr_schedule, make_optimizer  # noqa: F401
