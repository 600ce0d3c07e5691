"""Featuremap / gradient / batch-grid debug visualization.

TPU-native (NHWC, numpy+cv2) equivalents of the reference's debug surface:
``visualization/featuremaps_vis.py`` (per-channel featuremap dumps),
``visualization/grad_vis.py`` (gradient color/gray/saliency images) and
``visualization/debug_vis.py:14-45`` (image grid with joint overlays).
Arrays may be jax or numpy; everything is pulled to host float32 first —
these are offline debug hooks, not compute-path code.
"""

import math
import os
import os.path as osp
from typing import Optional

import cv2
import numpy as np


def _to_numpy(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _save_gray(path: str, img_hw: np.ndarray) -> None:
    os.makedirs(osp.dirname(path) or ".", exist_ok=True)
    cv2.imwrite(path, np.clip(img_hw, 0, 255).astype(np.uint8))


def save_featuremaps(
    featuremaps,
    save_folder: str,
    highlight: bool = True,
    per_channel: bool = False,
    file_prefix: Optional[str] = None,
    file_postfix: Optional[str] = None,
    max_channels: Optional[int] = None,
) -> int:
    """Dump per-(sample, channel) grayscale jpgs of an (N, H, W, C) array.

    ``highlight`` rescales to the full 0-255 range — globally (the
    reference's ``save_batch_featuremaps``) or per channel (its ``_develop``
    variant, ``per_channel=True``). ``max_channels`` caps the dump (the
    reference writes all C files; 48-channel features at every debug step
    flood the disk). Returns the number of files written.
    """
    fm = _to_numpy(featuremaps)
    if fm.ndim != 4:
        raise ValueError(f"expected (N, H, W, C), got {fm.shape}")
    n, _, _, c = fm.shape
    if highlight and not per_channel:
        fm = fm * (255.0 / (fm.max() - fm.min() + 1e-9))

    prefix = "" if file_prefix is None else f"{file_prefix}_"
    postfix = "" if file_postfix is None else f"_{file_postfix}"
    c_end = c if max_channels is None else min(c, int(max_channels))
    written = 0
    for b in range(n):
        for ch in range(c_end):
            img = fm[b, :, :, ch]
            if highlight and per_channel:
                img = img * (255.0 / (img.max() - img.min() + 1e-9))
            _save_gray(
                osp.join(save_folder, f"{prefix}{b}_{ch}{postfix}.jpg"), img
            )
            written += 1
    return written


def gradient_color_image(gradient) -> np.ndarray:
    """Min-max normalize a (H, W, C) gradient to a uint8 image
    (``grad_vis.get_gradient_color_image``)."""
    g = _to_numpy(gradient)
    g = g - g.min()
    g = g / (g.max() + 1e-12)
    return (g * 255).astype(np.uint8)


def gradient_gray_image(gradient) -> np.ndarray:
    """Channel-summed |grad|, 99th-percentile normalized, (H, W) uint8
    (``grad_vis.get_gradient_gray_image``; NHWC instead of CHW)."""
    g = _to_numpy(gradient)
    gray = np.abs(g).sum(axis=-1)
    hi = np.percentile(gray, 99)
    lo = gray.min()
    gray = np.clip((gray - lo) / (hi - lo + 1e-12), 0, 1)
    return (gray * 255).astype(np.uint8)


def positive_negative_saliency(gradient):
    """(pos, neg) saliency uint8 maps (``grad_vis.get_positive_negative_
    saliency``)."""
    g = _to_numpy(gradient)
    pos = np.maximum(0, g) / (g.max() + 1e-12)
    neg = np.maximum(0, -g) / (-g.min() + 1e-12)
    return (pos * 255).astype(np.uint8), (neg * 255).astype(np.uint8)


def make_grid(images: np.ndarray, nrow: int = 4, padding: int = 8) -> np.ndarray:
    """Tile (N, H, W, C) images into one grid image, min-max normalized to
    0-255 (the torchvision ``make_grid(normalize=True)`` the reference uses).
    Returns (grid_h, grid_w, C) float32."""
    imgs = _to_numpy(images)
    n, h, w, c = imgs.shape
    imgs = imgs - imgs.min()
    imgs = imgs * (255.0 / (imgs.max() + 1e-12))
    xmaps = min(nrow, n)
    ymaps = int(math.ceil(n / xmaps))
    grid = np.zeros(
        (ymaps * (h + padding) + padding, xmaps * (w + padding) + padding, c),
        np.float32,
    )
    for k in range(n):
        y, x = divmod(k, xmaps)
        y0 = y * (h + padding) + padding
        x0 = x * (w + padding) + padding
        grid[y0 : y0 + h, x0 : x0 + w] = imgs[k]
    return grid


def save_batch_image_with_joints(
    batch_image,
    batch_joints,
    batch_joints_vis=None,
    file_name: str = "debug_joints.jpg",
    nrow: int = 4,
    padding: int = 8,
) -> np.ndarray:
    """Grid of (N, H, W, C) images with per-sample joints drawn
    (``debug_vis.save_batch_image_with_joints``; NHWC, no torch).

    ``batch_joints`` (N, J, >=2) in per-image pixel coords; ``batch_joints_
    vis`` (N, J) or (N, J, 1) visibility, default all-visible.
    """
    imgs = _to_numpy(batch_image)
    n, h, w, _ = imgs.shape
    joints = _to_numpy(batch_joints)
    if batch_joints_vis is None:
        vis = np.ones(joints.shape[:2], np.float32)
    else:
        vis = _to_numpy(batch_joints_vis).reshape(joints.shape[0], -1)

    grid = np.clip(make_grid(imgs, nrow, padding), 0, 255).astype(np.uint8)
    if grid.shape[-1] == 1:
        grid = np.repeat(grid, 3, axis=-1)
    grid = np.ascontiguousarray(grid)

    xmaps = min(nrow, n)
    for k in range(n):
        y, x = divmod(k, xmaps)
        for j in range(joints.shape[1]):
            if vis[k, j] <= 0:
                continue
            px = int(x * (w + padding) + padding + joints[k, j, 0])
            py = int(y * (h + padding) + padding + joints[k, j, 1])
            cv2.circle(grid, (px, py), 2, (255, 0, 0), 2)
    os.makedirs(osp.dirname(file_name) or ".", exist_ok=True)
    cv2.imwrite(file_name, grid)
    return grid


def denormalize_image(image, mean=None, std=None) -> np.ndarray:
    """Reverse ImageNet normalization: (H, W, 3) RGB float -> uint8 BGR
    (``featuremaps_vis.tensor2im``)."""
    from fami_pose_tpu.data.video_dataset import IMAGENET_MEAN, IMAGENET_STD

    img = _to_numpy(image)
    m = np.asarray(IMAGENET_MEAN if mean is None else mean, np.float32)
    s = np.asarray(IMAGENET_STD if std is None else std, np.float32)
    img = (img * s + m) * 255.0
    img = np.clip(img, 0, 255).astype(np.uint8)
    return cv2.cvtColor(img, cv2.COLOR_RGB2BGR)
