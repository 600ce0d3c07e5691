"""Pose-level transforms: horizontal flips and half-body crop augmentation.

Semantics follow the reference ``datasets/process/pose_process.py:12-81``.
``flip_back`` is jittable (used by the flip-test eval path on device);
joint flipping and half-body cropping are host-side augmentation helpers.
"""

import numpy as np


def _coco_flip_pairs():
    # late import: data/__init__ imports the datasets, which import this
    # module — resolving the tables lazily breaks the cycle
    from ..data.keypoints import COCO_FLIP_PAIRS

    return COCO_FLIP_PAIRS


def _coco_upper_body_ids():
    from ..data.keypoints import COCO_UPPER_BODY_IDS

    return COCO_UPPER_BODY_IDS


def fliplr_joints(joints, joints_vis, width, matched_parts=None):
    """Mirror joints horizontally and swap left/right labels (numpy, host)."""
    if matched_parts is None:
        matched_parts = _coco_flip_pairs()
    joints = np.array(joints, copy=True)
    joints_vis = np.array(joints_vis, copy=True)
    joints[:, 0] = width - joints[:, 0] - 1
    perm = np.arange(joints.shape[0])
    for a, b in matched_parts:
        perm[a], perm[b] = b, a
    joints = joints[perm]
    joints_vis = joints_vis[perm]
    return joints * joints_vis, joints_vis


def flip_pair_permutation(num_joints, matched_parts=None):
    if matched_parts is None:
        matched_parts = _coco_flip_pairs()
    perm = np.arange(num_joints)
    for a, b in matched_parts:
        perm[a], perm[b] = b, a
    return perm


def flip_back(output_flipped, matched_parts=None):
    """Un-flip heatmaps predicted on mirrored inputs: (B, J, H, W).

    Works on numpy or jax arrays (pure indexing).
    """
    perm = flip_pair_permutation(output_flipped.shape[1], matched_parts)
    return output_flipped[:, perm, :, ::-1]


def flip_back_nhwc(output_flipped, matched_parts=None):
    """NHWC variant of ``flip_back``: (B, H, W, J) heatmaps from mirrored
    inputs -> un-mirrored with left/right joints swapped."""
    perm = flip_pair_permutation(output_flipped.shape[-1], matched_parts)
    return output_flipped[:, :, ::-1, :][..., perm]


def half_body_transform(
    joints, joints_vis, num_joints, upper_body_ids=None,
    aspect_ratio=0.75, pixel_std=200.0, rng=None,
):
    """Randomly crop to the upper or lower body (train-time augmentation).

    Returns (center, scale) of the sub-box, or (None, None) when too few
    joints are visible (caller keeps the full box).
    """
    if upper_body_ids is None:
        upper_body_ids = _coco_upper_body_ids()
    rng = rng or np.random
    vis_mask = joints_vis[:, 0] > 0
    upper_mask = np.zeros(num_joints, dtype=bool)
    upper_mask[list(upper_body_ids)] = True
    upper = joints[vis_mask & upper_mask]
    lower = joints[vis_mask & ~upper_mask]

    if rng.randn() < 0.5 and len(upper) > 2:
        selected = upper
    else:
        selected = lower if len(lower) > 2 else upper
    if len(selected) < 2:
        return None, None

    selected = np.asarray(selected, dtype=np.float32)[:, :2]
    center = selected.mean(axis=0)
    lt = selected.min(axis=0)
    rb = selected.max(axis=0)
    w, h = rb[0] - lt[0], rb[1] - lt[1]
    if w > aspect_ratio * h:
        h = w / aspect_ratio
    elif w < aspect_ratio * h:
        w = h * aspect_ratio
    scale = np.array([w / pixel_std, h / pixel_std], dtype=np.float32) * 1.5
    return center, scale
