from .registry import (
    Registry,
    MODEL_REGISTRY,
    DATASET_REGISTRY,
    CORE_FUNCTION_REGISTRY,
    TRAIN_PHASE,
    VAL_PHASE,
    TEST_PHASE,
    INFERENCE_PHASE,
)
from .bbox import box2cs, cs2box, xywh2cs
from .meters import AverageMeter
from .logging_utils import create_folder, reset_logger, phase_log_file
