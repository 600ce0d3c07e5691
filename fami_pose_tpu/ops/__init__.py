from .affine import (
    affine_matrix,
    apply_affine,
    invert_affine,
    get_affine_transform,
    dark_get_affine_transform,
    exec_affine_transform,
)
from .warp import warp_affine, warp_translate, bilinear_sample, crop_and_warp
from .heatmap import (
    generate_heatmaps,
    get_max_preds,
    get_final_preds,
    dark_get_final_preds,
    transform_preds,
)
from .pose import fliplr_joints, flip_back, half_body_transform
from .nms import oks_iou, oks_nms, soft_oks_nms, oks_nms_device, box_nms_device
from .nms import nms as box_nms  # bare `nms` would shadow the submodule name
from .coords import get_final_preds_coord
