import cv2
import numpy as np
import pytest

from fami_pose_tpu.ops import affine as A
from fami_pose_tpu.ops import warp as W


def test_warp_matches_cv2(rng):
    img = rng.rand(100, 120, 3).astype(np.float32) * 255
    center = np.array([60.0, 50.0])
    scale = np.array([0.5, 0.6])
    m = A.get_affine_transform(center, scale, 20.0, (72, 96)).astype(np.float32)
    want = cv2.warpAffine(img, m.astype(np.float64), (72, 96), flags=cv2.INTER_LINEAR)
    got = np.asarray(W.warp_affine(img[None], m[None], (96, 72)))[0]
    # cv2 uses 5-bit fixed-point interpolation weights -> small differences
    assert np.abs(got - want).max() < 1.0
    assert np.abs(got - want).mean() < 0.1


def test_warp_identity(rng):
    img = rng.rand(32, 40, 4).astype(np.float32)
    eye = np.array([[1.0, 0, 0], [0, 1, 0]], np.float32)
    out = np.asarray(W.warp_affine(img[None], eye[None], (32, 40)))[0]
    np.testing.assert_allclose(out, img, atol=1e-5)


def test_translate_integer_shift(rng):
    img = rng.rand(16, 16, 2).astype(np.float32)
    out = np.asarray(W.warp_translate(img[None], np.array([[3.0, -2.0]])))[0]
    # dst(x, y) = src(x - 3, y + 2); zero where out of bounds
    np.testing.assert_allclose(out[:14, 3:], img[2:, :13], atol=1e-6)
    assert np.all(out[:, :3] == 0)
    assert np.all(out[14:, :] == 0)


def test_translate_matches_kornia_semantics(rng):
    """kornia.warp_affine(img, [[1,0,tx],[0,1,ty]]) shifts content by +t."""
    img = np.zeros((1, 9, 9, 1), np.float32)
    img[0, 4, 4, 0] = 1.0
    out = np.asarray(W.warp_translate(img, np.array([[2.0, 1.0]])))
    assert out[0, 5, 6, 0] == 1.0


def test_crop_and_warp_matches_cv2(rng):
    frames = (rng.rand(2, 80, 90, 3) * 255).astype(np.uint8)
    centers = np.array([[45.0, 40.0], [30.0, 35.0]], np.float32)
    scales = np.array([[0.4, 0.5], [0.3, 0.35]], np.float32)
    rots = np.array([0.0, 15.0], np.float32)
    got = np.asarray(W.crop_and_warp(frames, centers, scales, rots, (96, 72), dark=True))
    for i in range(2):
        m = A.dark_get_affine_transform(centers[i], scales[i], rots[i], (72, 96))
        want = cv2.warpAffine(frames[i].astype(np.float32), m, (72, 96), flags=cv2.INTER_LINEAR)
        assert np.abs(got[i] - want).max() < 1.5


def test_warp_gradients_flow():
    import jax
    import jax.numpy as jnp

    img = jnp.ones((1, 8, 8, 1))

    def loss(off):
        return jnp.sum(W.warp_translate(img, off) ** 2)

    g = jax.grad(loss)(jnp.array([[0.5, 0.5]]))
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.slow
def test_warp_translate_matches_affine_path(rng):
    """The gather-free translation warp must equal the general affine warp."""
    import jax.numpy as jnp
    from fami_pose_tpu.ops.warp import warp_affine, warp_translate

    n, h, w, c = 3, 24, 20, 6
    imgs = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    offs = jnp.asarray((rng.rand(n, 2) * 16 - 8).astype(np.float32))
    eye = jnp.broadcast_to(jnp.eye(2, dtype=jnp.float32), (n, 2, 2))
    mats = jnp.concatenate([eye, offs[:, :, None]], axis=-1)
    ref = warp_affine(imgs, mats, (h, w))
    got = warp_translate(imgs, offs)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_warp_translate_integer_shift(rng):
    import jax.numpy as jnp
    from fami_pose_tpu.ops.warp import warp_translate

    img = np.zeros((1, 8, 8, 1), np.float32)
    img[0, 2, 3, 0] = 1.0
    out = np.asarray(warp_translate(jnp.asarray(img), jnp.asarray([[2.0, 1.0]])))
    # dst(x, y) = src(x-2, y-1): the peak moves from (3,2) to (5,3)
    assert out[0, 3, 5, 0] == pytest.approx(1.0)
    assert out.sum() == pytest.approx(1.0)


def test_warp_translate_matmul_matches_slice(rng):
    """MXU selection-matrix warp == vmapped-dynamic_slice warp to 1 ulp
    (row/column blend order differs, so f32 intermediates round once more).

    Covers integer, fractional, negative, zero, and beyond-clamp shifts.
    """
    import jax
    import jax.numpy as jnp
    from fami_pose_tpu.ops.warp import warp_translate, warp_translate_matmul

    n, h, w, c = 8, 24, 20, 6
    imgs = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    offs = np.array(
        [
            [0.0, 0.0],
            [3.0, -5.0],
            [0.5, -1.25],
            [-7.75, 7.75],
            [26.0, -26.0],
            [40.0, -40.0],  # beyond the clamp
            [-0.01, 0.01],
            [12.3, 4.7],
        ],
        np.float32,
    )
    offs = jnp.asarray(offs)
    ref = jax.jit(lambda a, b: warp_translate(a, b, max_shift=26))(imgs, offs)
    got = jax.jit(lambda a, b: warp_translate_matmul(a, b, max_shift=26))(
        imgs, offs
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=3e-7, atol=2e-7
    )


def test_warp_translate_matmul_bf16(rng):
    """bf16 path blends at bf16 like the reference; 1-2 ulp tolerance."""
    import jax.numpy as jnp
    from fami_pose_tpu.ops.warp import warp_translate, warp_translate_matmul

    n, h, w, c = 4, 16, 12, 8
    imgs = jnp.asarray(rng.rand(n, h, w, c), jnp.bfloat16)
    offs = jnp.asarray((rng.rand(n, 2) * 20 - 10).astype(np.float32))
    ref = np.asarray(warp_translate(imgs, offs, max_shift=26), np.float32)
    got = np.asarray(warp_translate_matmul(imgs, offs, max_shift=26), np.float32)
    assert np.abs(got - ref).max() <= 2.0 ** -6


def test_warp_translate_matmul_gradients_match(rng):
    """Image AND offset cotangents must match jax.grad of warp_translate."""
    import jax
    import jax.numpy as jnp
    from fami_pose_tpu.ops.warp import warp_translate, warp_translate_matmul

    n, h, w, c = 2, 10, 9, 3
    imgs = jnp.asarray(rng.rand(n, h, w, c).astype(np.float32))
    offs = jnp.asarray(np.array([[1.4, -2.6], [-0.3, 3.7]], np.float32))

    def loss(fn, im, of):
        return jnp.sum(jnp.sin(fn(im, of, max_shift=26)))

    g_ref = jax.grad(lambda im, of: loss(warp_translate, im, of), (0, 1))(
        imgs, offs
    )
    g_got = jax.grad(
        lambda im, of: loss(warp_translate_matmul, im, of), (0, 1)
    )(imgs, offs)
    np.testing.assert_allclose(
        np.asarray(g_got[0]), np.asarray(g_ref[0]), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_got[1]), np.asarray(g_ref[1]), rtol=1e-4, atol=1e-5
    )
