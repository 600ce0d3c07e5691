from .train_state import TrainState, create_train_state
from .steps import make_train_step, make_eval_step, heatmap_pck_accuracy
from . import checkpoints
from .runner import Runner
