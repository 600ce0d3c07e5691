"""Featuremap / gradient / grid debug visualization."""

import numpy as np

from fami_pose_tpu.visualization.debug import (
    denormalize_image,
    gradient_color_image,
    gradient_gray_image,
    make_grid,
    positive_negative_saliency,
    save_batch_image_with_joints,
    save_featuremaps,
)


def test_save_featuremaps_writes_capped_files(rng, tmp_path):
    fm = rng.randn(2, 8, 6, 5).astype(np.float32)
    n = save_featuremaps(fm, str(tmp_path), max_channels=3)
    assert n == 2 * 3
    files = sorted(p.name for p in tmp_path.iterdir())
    assert files[0] == "0_0.jpg" and len(files) == 6


def test_save_featuremaps_per_channel_normalization(rng, tmp_path):
    fm = np.zeros((1, 8, 8, 2), np.float32)
    fm[0, :4, :, 0] = 1e-3  # tiny range: per-channel highlight stretches it
    fm[0, :, :, 1] = 100.0
    save_featuremaps(fm, str(tmp_path), per_channel=True, file_prefix="p")
    import cv2

    img = cv2.imread(str(tmp_path / "p_0_0.jpg"), cv2.IMREAD_GRAYSCALE)
    assert img.max() > 200  # stretched to full range


def test_gradient_images(rng):
    g = rng.randn(8, 6, 3).astype(np.float32)
    color = gradient_color_image(g)
    assert color.dtype == np.uint8 and color.shape == (8, 6, 3)
    gray = gradient_gray_image(g)
    assert gray.shape == (8, 6) and gray.dtype == np.uint8
    pos, neg = positive_negative_saliency(g)
    # positive saliency is zero where gradient is negative
    assert pos[g[..., 0] < 0].size and (pos[..., 0][g[..., 0] < 0] == 0).all()
    assert (neg[..., 0][g[..., 0] > 0] == 0).all()


def test_grid_with_joints(rng, tmp_path):
    imgs = rng.rand(5, 16, 12, 3).astype(np.float32)
    joints = np.tile(np.array([[3.0, 4.0], [10.0, 12.0]]), (5, 1, 1))
    vis = np.ones((5, 2, 1))
    out = str(tmp_path / "sub" / "grid.jpg")
    grid = save_batch_image_with_joints(imgs, joints, vis, out, nrow=3)
    assert (tmp_path / "sub" / "grid.jpg").exists()
    # 2 rows x 3 cols with padding 8
    assert grid.shape == (2 * 24 + 8, 3 * 20 + 8, 3)


def test_denormalize_roundtrip(rng):
    raw = (rng.rand(6, 5, 3) * 255).astype(np.uint8)
    from fami_pose_tpu.data.video_dataset import IMAGENET_MEAN, IMAGENET_STD

    normed = (raw.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    back = denormalize_image(normed)  # BGR
    assert np.abs(back[..., ::-1].astype(int) - raw.astype(int)).max() <= 1
