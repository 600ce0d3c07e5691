"""Modulated deformable conv vs a straightforward numpy golden model.

The golden implements the documented DCNv2 semantics (torchvision
``deform_conv2d`` contract: (dy, dx) offset pairs per offset-group and tap,
mask applied to the sampled value before the conv weight, bilinear sampling
with zeros outside) as explicit loops — slow but obviously correct.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.ops.deform_conv import deform_conv2d


def golden_deform_conv2d(x, offset, mask, weight, bias, stride, padding, dilation):
    """Loop-based NHWC DCNv2. x:(N,H,W,C) offset:(N,Ho,Wo,2GK) mask:(N,Ho,Wo,GK)
    weight:(kh,kw,C,Cout)."""
    n, h, w, c = x.shape
    kh, kw, _, c_out = weight.shape
    k = kh * kw
    _, ho, wo, oc = offset.shape
    g = oc // (2 * k)
    cg = c // g

    def sample(img2d, y, xx):
        # img2d: (H, W); bilinear with zero padding
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        val = 0.0
        for dy, sy in ((0, 1 - wy), (1, wy)):
            for dx, sx in ((0, 1 - wx), (1, wx)):
                yy, xc = y0 + dy, x0 + dx
                if 0 <= yy < h and 0 <= xc < w:
                    val += sy * sx * img2d[yy, xc]
        return val

    out = np.zeros((n, ho, wo, c_out), np.float64)
    for ni in range(n):
        for i in range(ho):
            for j in range(wo):
                col = np.zeros((k, c), np.float64)
                for a in range(kh):
                    for b in range(kw):
                        t = a * kw + b
                        for gi in range(g):
                            dy = offset[ni, i, j, 2 * (gi * k + t)]
                            dx = offset[ni, i, j, 2 * (gi * k + t) + 1]
                            m = 1.0 if mask is None else mask[ni, i, j, gi * k + t]
                            y = i * stride - padding + a * dilation + dy
                            xx = j * stride - padding + b * dilation + dx
                            for ci in range(cg):
                                ch = gi * cg + ci
                                col[t, ch] = m * sample(x[ni, :, :, ch], y, xx)
                wk = weight.astype(np.float64).reshape(k, c, c_out)
                out[ni, i, j] = np.einsum("kc,kco->o", col, wk)
    if bias is not None:
        out = out + bias
    return out.astype(np.float32)


@pytest.mark.parametrize(
    "stride,padding,dilation,groups",
    [(1, 1, 1, 1), (1, 3, 3, 2), (2, 1, 1, 1), (1, 2, 2, 4)],
)
def test_deform_conv_matches_golden(rng, stride, padding, dilation, groups):
    n, h, w, c = 2, 7, 6, 8
    kh = kw = 3
    c_out = 5
    k = kh * kw
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    x = rng.randn(n, h, w, c).astype(np.float32)
    offset = (rng.randn(n, ho, wo, 2 * groups * k) * 2).astype(np.float32)
    mask = rng.rand(n, ho, wo, groups * k).astype(np.float32)
    weight = (rng.randn(kh, kw, c, c_out) * 0.2).astype(np.float32)
    bias = rng.randn(c_out).astype(np.float32)

    ref = golden_deform_conv2d(x, offset, mask, weight, bias, stride, padding, dilation)
    got = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask), jnp.asarray(weight),
        jnp.asarray(bias), stride=stride, padding=padding, dilation=dilation,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_deform_conv_no_mask_is_dcnv1(rng):
    n, h, w, c = 1, 5, 5, 4
    offset = np.zeros((1, 5, 5, 2 * 9), np.float32)
    x = rng.randn(n, h, w, c).astype(np.float32)
    weight = rng.randn(3, 3, c, 3).astype(np.float32)
    got = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), None, jnp.asarray(weight),
        stride=1, padding=1, dilation=1,
    )
    ref = golden_deform_conv2d(x, offset, None, weight, None, 1, 1, 1)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_zero_offset_unit_mask_equals_plain_conv(rng):
    """With zero offsets and unit mask, DCN == standard convolution."""
    n, h, w, c = 2, 9, 8, 6
    c_out = 4
    x = rng.randn(n, h, w, c).astype(np.float32)
    weight = (rng.randn(3, 3, c, c_out) * 0.3).astype(np.float32)
    offset = np.zeros((n, h, w, 2 * 9), np.float32)
    mask = np.ones((n, h, w, 9), np.float32)
    got = deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(mask),
        jnp.asarray(weight), stride=1, padding=1, dilation=1,
    )
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(x), jnp.asarray(weight), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_gradients_flow(rng):
    """Grad w.r.t. input, offsets, mask, and weight must be finite/nonzero."""
    n, h, w, c = 1, 6, 6, 4
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    offset = jnp.asarray((rng.randn(n, h, w, 2 * 9) * 0.5).astype(np.float32))
    mask = jnp.asarray(rng.rand(n, h, w, 9).astype(np.float32))
    weight = jnp.asarray((rng.randn(3, 3, c, 3) * 0.2).astype(np.float32))

    def loss(x, offset, mask, weight):
        out = deform_conv2d(x, offset, mask, weight, stride=1, padding=1, dilation=1)
        return jnp.sum(out**2)

    grads = jax.grad(loss, argnums=(0, 1, 2, 3))(x, offset, mask, weight)
    for g in grads:
        assert bool(jnp.isfinite(g).all())
        assert float(jnp.abs(g).max()) > 0


def test_numeric_gradient_offset(rng):
    """Finite-difference check of the offset gradient (bilinear is piecewise
    smooth; probe away from integer lattice points)."""
    n, h, w, c = 1, 5, 5, 2
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    offset = jnp.full((n, 5, 5, 2 * 9), 0.3, jnp.float32)
    weight = jnp.asarray((rng.randn(3, 3, c, 2) * 0.3).astype(np.float32))

    def loss(off):
        return jnp.sum(
            deform_conv2d(x, off, None, weight, stride=1, padding=1, dilation=1) ** 2
        )

    g = jax.grad(loss)(offset)
    eps = 1e-3
    idx = (0, 2, 2, 5)
    e = jnp.zeros_like(offset).at[idx].set(eps)
    fd = (loss(offset + e) - loss(offset - e)) / (2 * eps)
    np.testing.assert_allclose(float(g[idx]), float(fd), rtol=2e-2, atol=1e-3)
