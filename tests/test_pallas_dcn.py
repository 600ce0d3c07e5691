"""Fused Pallas DCN kernel vs the windowed XLA reference (interpret mode on
CPU; the same comparison runs compiled on real TPU hardware)."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax
import jax.numpy as jnp

from fami_pose_tpu.ops.deform_conv import deform_conv2d_windowed
from fami_pose_tpu.ops.pallas.dcn import deform_conv2d_pallas, make_deform_conv_fn


def _inputs(rng, n=2, h=32, w=24, c=8, g=2, d=2, c_out=6):
    k = 9
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    off = jnp.asarray((rng.rand(n, h, w, 2 * g * k) * 2 * d - d).astype(np.float32))
    msk = jnp.asarray(rng.rand(n, h, w, g * k).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, c_out) * 0.2).astype(np.float32))
    bias = jnp.asarray(rng.randn(c_out).astype(np.float32))
    return x, off, msk, wgt, bias


@pytest.mark.parametrize("dilation", [1, 3])
@pytest.mark.parametrize("kernel_version", [2, 3, 4, 5, 6, 7, 9, 10])
def test_pallas_matches_windowed(rng, dilation, kernel_version):
    x, off, msk, wgt, bias = _inputs(rng)
    ref = deform_conv2d_windowed(
        x, off, msk, wgt, bias, padding=dilation, dilation=dilation, max_offset=2
    )
    got = deform_conv2d_pallas(
        x, off, msk, wgt, bias, padding=dilation, dilation=dilation,
        offset_groups=2, max_offset=2, row_block=8,
        kernel_version=kernel_version,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_no_mask(rng):
    x, off, _, wgt, _ = _inputs(rng)
    ref = deform_conv2d_windowed(
        x, off, None, wgt, None, padding=3, dilation=3, max_offset=2
    )
    got = deform_conv2d_pallas(
        x, off, None, wgt, None, padding=3, dilation=3,
        offset_groups=2, max_offset=2, row_block=8,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_factory_custom_vjp_gradients(rng):
    """Pallas forward + windowed backward must give the windowed grads."""
    x, off, msk, wgt, bias = _inputs(rng, n=1, h=16, w=16)
    fn = make_deform_conv_fn(
        padding=3, dilation=3, offset_groups=2, max_offset=2, use_pallas=True
    )

    def loss(off):
        return jnp.sum(fn(x, off, msk, wgt, bias) ** 2)

    def loss_ref(off):
        return jnp.sum(
            deform_conv2d_windowed(
                x, off, msk, wgt, bias, padding=3, dilation=3, max_offset=2
            )
            ** 2
        )

    g = jax.grad(loss)(off)
    g_ref = jax.grad(loss_ref)(off)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("bwd_version", [3, 9])
def test_bwd_pallas_all_grads_match_vjp(rng, bwd_version):
    """All five gradients of the fused backward (both kernel generations)
    vs jax.vjp through the windowed XLA reference."""
    from fami_pose_tpu.ops.pallas.dcn_bwd import (
        deform_conv2d_windowed_bwd_pallas,
    )

    x, off, msk, wgt, bias = _inputs(rng, n=2, h=16, w=16)
    gout = jnp.asarray(rng.randn(2, 16, 16, 6).astype(np.float32))

    def f(x, off, msk, wgt, bias):
        return deform_conv2d_windowed(
            x, off, msk, wgt, bias, padding=3, dilation=3, max_offset=2
        )

    _, vjp = jax.vjp(f, x, off, msk, wgt, bias)
    refs = vjp(gout)
    got = deform_conv2d_windowed_bwd_pallas(
        x, off, msk, wgt, gout, padding=3, dilation=3, offset_groups=2,
        max_offset=2, row_block=8, kernel_version=bwd_version,
    )
    names = ("dx", "doffset", "dmask", "dweight", "dbias")
    for name, g, r in zip(names, got, refs):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), rtol=2e-3, atol=2e-4,
            err_msg=f"{name} (bwd_version={bwd_version})",
        )


def test_factory_windowed_passthrough(rng):
    x, off, msk, wgt, bias = _inputs(rng, n=1, h=16, w=16)
    fn = make_deform_conv_fn(
        padding=3, dilation=3, offset_groups=2, max_offset=2, use_pallas=False
    )
    ref = deform_conv2d_windowed(
        x, off, msk, wgt, bias, padding=3, dilation=3, max_offset=2
    )
    np.testing.assert_allclose(np.asarray(fn(x, off, msk, wgt, bias)), np.asarray(ref))


def _to_cf(off, msk, g, k=9):
    """NHWC [g][k][*]-ordered aux -> (N, ch, H, W) kernel-major."""
    n, h, w, _ = off.shape
    off_cf = (
        off.reshape(n, h, w, g, k, 2).transpose(0, 4, 5, 3, 1, 2)
        .reshape(n, 2 * g * k, h, w)
    )
    msk_cf = (
        msk.reshape(n, h, w, g, k).transpose(0, 4, 3, 1, 2)
        .reshape(n, g * k, h, w)
    )
    return off_cf, msk_cf


def test_aux_channel_first_matches_nhwc(rng):
    x, off, msk, wgt, bias = _inputs(rng)
    ref = deform_conv2d_pallas(
        x, off, msk, wgt, bias, padding=3, dilation=3,
        offset_groups=2, max_offset=2, row_block=8,
    )
    off_cf, msk_cf = _to_cf(np.asarray(off), np.asarray(msk), g=2)
    got = deform_conv2d_pallas(
        x, jnp.asarray(off_cf), jnp.asarray(msk_cf), wgt, bias,
        padding=3, dilation=3, offset_groups=2, max_offset=2, row_block=8,
        aux_channel_first=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_aux_channel_first_gradients(rng):
    """custom_vjp grads through the channel-first layout == windowed grads
    (chain rule through the layout conversion is exact)."""
    x, off, msk, wgt, bias = _inputs(rng, n=1, h=16, w=16)
    fn_cf = make_deform_conv_fn(
        padding=3, dilation=3, offset_groups=2, max_offset=2,
        use_pallas=True, aux_channel_first=True,
    )

    def loss_cf(off_nhwc):
        off_cf, msk_cf = _to_cf(off_nhwc, msk, g=2)
        return jnp.sum(fn_cf(x, off_cf, msk_cf, wgt, bias) ** 2)

    def loss_ref(off_nhwc):
        return jnp.sum(
            deform_conv2d_windowed(
                x, off_nhwc, msk, wgt, bias, padding=3, dilation=3,
                max_offset=2,
            ) ** 2
        )

    g = jax.grad(loss_cf)(off)
    g_ref = jax.grad(loss_ref)(off)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_v10_bitwise_matches_v3_at_d4(rng):
    """v10 (row-stacked wide-gather staging) is the same sampling math as
    v3 — identical clamps, corner clips and hat weights; only the staging
    layout and instruction shapes differ. At the D=4 parity window they
    must agree (bitwise in f32 interpret on the data tried here)."""
    x, off, msk, wgt, bias = _inputs(rng, n=2, h=32, w=24)
    kw = dict(padding=3, dilation=3, offset_groups=2, max_offset=4,
              row_block=8)
    a = deform_conv2d_pallas(x, off, msk, wgt, bias, kernel_version=10, **kw)
    b = deform_conv2d_pallas(x, off, msk, wgt, bias, kernel_version=3, **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
