from .train_state import TrainState, create_train_state
from .steps import make_train_step, make_eval_step
