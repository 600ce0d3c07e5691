import cv2
import numpy as np
import pytest

from fami_pose_tpu.ops import affine as A


def _cv2_golden(center, scale, rot, output_size, shift=(0, 0), inv=0, dark=False):
    """Independent golden: build the documented 3-point correspondence and let
    cv2 solve it (the reference's construction, affine_transform.py:13-77)."""
    center = np.asarray(center, np.float32)
    scale = np.asarray(scale, np.float32)
    shift = np.asarray(shift, np.float32)
    size = scale * 200.0
    sw = size[0] - 1 if dark else size[0]
    dw = output_size[0] - 1 if dark else output_size[0]
    dh = output_size[1] - 1 if dark else output_size[1]

    rad = np.pi * rot / 180.0
    rot_mat = np.array([[np.cos(rad), -np.sin(rad)], [np.sin(rad), np.cos(rad)]])
    src_dir = rot_mat @ np.array([0.0, -0.5 * sw])
    dst_dir = np.array([0.0, -0.5 * dw])

    def third(a, b):
        d = a - b
        return b + np.array([-d[1], d[0]], np.float32)

    src = np.zeros((3, 2), np.float32)
    dst = np.zeros((3, 2), np.float32)
    src[0] = center + size * shift
    src[1] = center + src_dir + size * shift
    src[2] = third(src[0], src[1])
    dst[0] = [dw * 0.5, dh * 0.5]
    dst[1] = dst[0] + dst_dir
    dst[2] = third(dst[0], dst[1])

    if inv:
        return cv2.getAffineTransform(dst, src)
    return cv2.getAffineTransform(src, dst)


@pytest.mark.parametrize("rot", [0.0, 30.0, -45.0, 90.0])
@pytest.mark.parametrize("inv", [0, 1])
@pytest.mark.parametrize("dark", [False, True])
def test_matrix_matches_cv2_solve(rot, inv, dark):
    center = np.array([320.0, 240.0])
    scale = np.array([1.8, 2.4])
    out = (288, 384)
    fn = A.dark_get_affine_transform if dark else A.get_affine_transform
    got = fn(center, scale, rot, out, inv=inv)
    want = _cv2_golden(center, scale, rot, out, inv=inv, dark=dark)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_shift_matches_cv2():
    center = np.array([100.0, 50.0])
    scale = np.array([1.0, 1.5])
    shift = np.array([0.1, -0.05], np.float32)
    got = A.get_affine_transform(center, scale, 15.0, (72, 96), shift=shift)
    want = _cv2_golden(center, scale, 15.0, (72, 96), shift=shift)
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_scalar_scale_promoted():
    m = A.get_affine_transform([50.0, 50.0], 1.0, 0, (64, 64))
    assert m.shape == (2, 3)


def test_apply_and_exec_agree():
    m = A.get_affine_transform([320.0, 240.0], [1.8, 2.4], 30.0, (288, 384))
    pt = np.array([300.0, 200.0])
    got = A.exec_affine_transform(pt, m)
    got2 = A.apply_affine(pt[None].astype(np.float32), m[None].astype(np.float32))[0]
    np.testing.assert_allclose(got, got2, atol=1e-2)


def test_forward_inverse_roundtrip():
    center = np.array([320.0, 240.0])
    scale = np.array([1.8, 2.4])
    fwd = A.affine_matrix(center, scale, 25.0, (288, 384))
    inv = A.affine_matrix(center, scale, 25.0, (288, 384), inv=True)
    pts = np.random.RandomState(0).rand(5, 2).astype(np.float32) * 500
    warped = A.apply_affine(pts, fwd)
    back = A.apply_affine(warped, inv)
    np.testing.assert_allclose(back, pts, atol=1e-2)
    # invert_affine agrees with the analytic inverse
    np.testing.assert_allclose(A.invert_affine(fwd), inv, atol=1e-3)


def test_batched_jnp_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.RandomState(1)
    centers = rng.rand(8, 2).astype(np.float32) * 600
    scales = (rng.rand(8, 2).astype(np.float32) + 0.5) * 2
    rots = rng.uniform(-60, 60, 8).astype(np.float32)
    batched = np.asarray(A.affine_matrix(jnp.asarray(centers), jnp.asarray(scales), jnp.asarray(rots), (288, 384)))
    for i in range(8):
        single = A.get_affine_transform(centers[i], scales[i], rots[i], (288, 384))
        np.testing.assert_allclose(batched[i], single, atol=1e-2)
