from . import keypoints
from .coco_json import COCOJson
from .video_dataset import BaseDataset, VideoDataset
from .posetrack import PoseTrackDataset
from .jhmdb import JHMDBDataset
from .loader import (
    DataLoader,
    build_train_loader,
    build_eval_loader,
    collate,
    prepare_train_batch,
    prepare_eval_inputs,
)
