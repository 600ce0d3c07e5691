import cv2
import numpy as np

from fami_pose_tpu.ops import affine as A
from fami_pose_tpu.ops import heatmap as H

IMG = (288, 384)  # w, h
HM = (72, 96)


def _golden_stamp(joints, vis, sigma, image_size, heatmap_size):
    """Independent numpy golden of the documented stamping behavior
    (quantized center, 3-sigma window, drop when window misses the map)."""
    J = joints.shape[0]
    w, h = heatmap_size
    weight = vis[:, :1].astype(np.float64).copy()
    target = np.zeros((J, h, w))
    t = sigma * 3
    for j in range(J):
        mx = int(joints[j, 0] / (image_size[0] / w) + 0.5)
        my = int(joints[j, 1] / (image_size[1] / h) + 0.5)
        if mx - t >= w or my - t >= h or mx + t + 1 < 0 or my + t + 1 < 0:
            weight[j] = 0
            continue
        if weight[j] < 0.5:
            continue
        for py in range(max(0, my - t), min(h, my + t + 1)):
            for px in range(max(0, mx - t), min(w, mx + t + 1)):
                target[j, py, px] = np.exp(
                    -((px - mx) ** 2 + (py - my) ** 2) / (2 * sigma**2)
                )
    return target, weight


def test_generate_matches_golden(rng):
    J = 17
    joints = rng.rand(J, 2) * [IMG[0] * 1.2, IMG[1] * 1.2] - 20  # some out of bounds
    vis = (rng.rand(J, 1) > 0.2).astype(np.float64) * np.ones((J, 3))
    got_t, got_w = H.generate_heatmaps(joints[None], vis[None, :, 0], 3, IMG, HM)
    want_t, want_w = _golden_stamp(joints, vis, 3, IMG, HM)
    np.testing.assert_allclose(np.asarray(got_w)[0], want_w, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_t)[0], want_t, atol=1e-5)


def test_generate_far_outside_zero_weight():
    joints = np.array([[[-500.0, -500.0], [100.0, 100.0]]])
    vis = np.array([[1.0, 1.0]])
    t, w = H.generate_heatmaps(joints, vis, 2, IMG, HM)
    assert np.asarray(w)[0, 0, 0] == 0.0
    assert np.asarray(w)[0, 1, 0] == 1.0
    assert np.asarray(t)[0, 0].max() == 0.0


def test_get_max_preds(rng):
    hm = rng.rand(2, 3, 96, 72).astype(np.float32)
    coords, maxv = H.get_max_preds(hm)
    flat = hm.reshape(2, 3, -1)
    idx = flat.argmax(-1)
    np.testing.assert_array_equal(np.asarray(coords)[..., 0], idx % 72)
    np.testing.assert_array_equal(np.asarray(coords)[..., 1], idx // 72)
    np.testing.assert_allclose(np.asarray(maxv)[..., 0], flat.max(-1))


def test_final_preds_quarter_shift():
    hm = np.zeros((1, 1, 96, 72), np.float32)
    hm[0, 0, 40, 30] = 1.0
    hm[0, 0, 40, 31] = 0.5  # gradient points +x
    hm[0, 0, 39, 30] = 0.2  # gradient points -y
    center = np.array([[36.0, 48.0]], np.float32)
    scale = np.array([[72 / 200.0, 96 / 200.0]], np.float32)  # identity transform
    preds, _ = H.get_final_preds(hm, center, scale)
    np.testing.assert_allclose(np.asarray(preds)[0, 0], [30.25, 39.75], atol=1e-4)


def test_final_preds_inverse_affine(rng):
    hm = np.zeros((1, 2, 96, 72), np.float32)
    hm[0, 0, 10, 20] = 1.0
    hm[0, 1, 50, 60] = 1.0
    center = np.array([[300.0, 200.0]], np.float32)
    scale = np.array([[1.5, 2.0]], np.float32)
    preds, _ = H.get_final_preds(hm, center, scale)
    inv = A.get_affine_transform(center[0], scale[0], 0, (72, 96), inv=1)
    want0 = A.exec_affine_transform([20.0, 10.0], inv)
    np.testing.assert_allclose(np.asarray(preds)[0, 0], want0, atol=1e-2)


def test_dark_blur_matches_cv2(rng):
    hm = rng.rand(1, 2, 24, 18).astype(np.float32)
    got = np.asarray(H.dark_blur(hm, 11))
    for j in range(2):
        border = 5
        padded = np.zeros((24 + 10, 18 + 10), np.float32)
        padded[border:-border, border:-border] = hm[0, j]
        blurred = cv2.GaussianBlur(padded, (11, 11), 0)[border:-border, border:-border]
        blurred *= hm[0, j].max() / blurred.max()
        np.testing.assert_allclose(got[0, j], blurred, atol=1e-4)


def test_dark_decode_recovers_subpixel_peak():
    # a true Gaussian with sub-pixel center should decode near-exactly
    cx, cy, sigma = 30.35, 40.7, 3.0
    ys, xs = np.mgrid[0:96, 0:72]
    hm = np.exp(-((xs - cx) ** 2 + (ys - cy) ** 2) / (2 * sigma**2)).astype(np.float32)
    center = np.array([[36.0, 48.0]], np.float32)
    scale = np.array([[72 / 200.0, 96 / 200.0]], np.float32)
    preds, _ = H.dark_get_final_preds(hm[None, None], center, scale)
    np.testing.assert_allclose(np.asarray(preds)[0, 0], [cx, cy], atol=0.05)
