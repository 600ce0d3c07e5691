"""Windowed (gather-free) DCN vs the exact gather implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_windowed


@pytest.mark.parametrize("dilation,groups", [(1, 1), (3, 2)])
def test_windowed_matches_exact_in_window(rng, dilation, groups):
    n, h, w, c = 2, 10, 8, 8
    k = 9
    d = 2
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    off = jnp.asarray(
        (rng.rand(n, h, w, 2 * groups * k) * 2 * d - d).astype(np.float32)
    )
    msk = jnp.asarray(rng.rand(n, h, w, groups * k).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, 5) * 0.2).astype(np.float32))
    bias = jnp.asarray(rng.randn(5).astype(np.float32))

    ref = deform_conv2d(
        x, off, msk, wgt, bias, stride=1, padding=dilation, dilation=dilation
    )
    got = deform_conv2d_windowed(
        x, off, msk, wgt, bias, padding=dilation, dilation=dilation, max_offset=d
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_windowed_clamps_large_offsets(rng):
    n, h, w, c = 1, 8, 8, 4
    d = 2
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    off_big = jnp.asarray((rng.rand(n, h, w, 18) * 30 - 15).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, 3) * 0.2).astype(np.float32))
    ref = deform_conv2d(
        x, jnp.clip(off_big, -d, d), None, wgt, stride=1, padding=1, dilation=1
    )
    got = deform_conv2d_windowed(
        x, off_big, None, wgt, padding=1, dilation=1, max_offset=d
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


@pytest.mark.slow
def test_windowed_gradients(rng):
    n, h, w, c = 1, 6, 6, 4
    d = 2
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    off = jnp.asarray((rng.rand(n, h, w, 18) * 2 - 1).astype(np.float32))
    msk = jnp.asarray(rng.rand(n, h, w, 9).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, 3) * 0.2).astype(np.float32))

    def loss(x, off, msk, wgt):
        return jnp.sum(
            deform_conv2d_windowed(
                x, off, msk, wgt, padding=1, dilation=1, max_offset=d
            )
            ** 2
        )

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, off, msk, wgt)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
    # offset gradient matches the exact implementation's
    g_exact = jax.grad(
        lambda o: jnp.sum(
            deform_conv2d(x, o, msk, wgt, stride=1, padding=1, dilation=1) ** 2
        )
    )(off)
    np.testing.assert_allclose(
        np.asarray(grads[1]), np.asarray(g_exact), rtol=1e-3, atol=1e-3
    )


@pytest.mark.parametrize("dilation,groups,d", [(1, 1, 1), (3, 2, 1), (3, 2, 2)])
def test_static_matches_exact_in_window(rng, dilation, groups, d):
    from fami_pose_tpu.ops.deform_conv import deform_conv2d_static

    n, h, w, c = 2, 10, 8, 8
    k = 9
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    off = jnp.asarray(
        (rng.rand(n, h, w, 2 * groups * k) * 2 * d - d).astype(np.float32)
    )
    msk = jnp.asarray(rng.rand(n, h, w, groups * k).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, 5) * 0.2).astype(np.float32))
    bias = jnp.asarray(rng.randn(5).astype(np.float32))

    ref = deform_conv2d(
        x, off, msk, wgt, bias, stride=1, padding=dilation, dilation=dilation
    )
    got = deform_conv2d_static(
        x, off, msk, wgt, bias, padding=dilation, dilation=dilation,
        max_offset=d,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_static_matches_windowed_clamping(rng):
    """Large offsets: both clamp to the same window -> identical results,
    including the boundary case t == +/-D where the dropped (D+1) cell of
    the tight window carries hat weight exactly 0."""
    from fami_pose_tpu.ops.deform_conv import deform_conv2d_static

    n, h, w, c = 1, 8, 8, 4
    d = 2
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    off_big = jnp.asarray(
        (rng.rand(n, h, w, 18) * 30 - 15).astype(np.float32)
    )
    # force some exact +/-D boundary offsets
    off_big = off_big.at[:, :2, :2, :].set(float(d))
    wgt = jnp.asarray((rng.randn(3, 3, c, 3) * 0.2).astype(np.float32))
    ref = deform_conv2d_windowed(
        x, off_big, None, wgt, padding=1, dilation=1, max_offset=d
    )
    got = deform_conv2d_static(
        x, off_big, None, wgt, padding=1, dilation=1, max_offset=d
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4
    )
