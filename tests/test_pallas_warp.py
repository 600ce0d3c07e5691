"""Fused Pallas global-alignment warp vs the XLA ``warp_translate`` path
(interpret mode on CPU; the identical comparison runs compiled on real TPU —
see docs/PALLAS_ONCHIP_PARITY.md and tools/pallas_onchip_parity.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.ops.warp import warp_translate
from fami_pose_tpu.ops.pallas.warp import (
    make_warp_translate_fn,
    warp_translate_pallas,
)

MAX_SHIFT = 26


def _cases(rng, n=4):
    return {
        "zero": np.zeros((n, 2), np.float32),
        "int": np.stack(
            [
                np.array([3, -5, 7, 0], np.float32),
                np.array([-2, 4, 0, 6], np.float32),
            ],
            axis=1,
        ),
        "frac": np.stack(
            [
                np.array([0.5, -1.25, 2.75, 0.1], np.float32),
                np.array([-0.5, 1.75, 0.0, -3.3], np.float32),
            ],
            axis=1,
        ),
        "clamped": np.array(
            [[40.0, -40.0], [-40.0, 40.0], [26.0, -26.0], [25.5, 25.5]],
            np.float32,
        ),
        "rand": rng.uniform(-20, 20, (n, 2)).astype(np.float32),
    }


@pytest.mark.parametrize("case", ["zero", "int", "frac", "clamped", "rand"])
def test_pallas_warp_matches_xla(rng, case):
    rng2 = np.random.default_rng(0)
    n, h, w, c = 4, 12, 20, 3
    imgs = rng2.standard_normal((n, h, w, c)).astype(np.float32)
    offs = _cases(rng2)[case]
    ref = warp_translate(jnp.asarray(imgs), jnp.asarray(offs), max_shift=MAX_SHIFT)
    got = warp_translate_pallas(
        jnp.asarray(imgs), jnp.asarray(offs), max_shift=MAX_SHIFT, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pallas_warp_bf16(rng):
    rng2 = np.random.default_rng(1)
    n, h, w, c = 2, 10, 16, 4
    imgs = jnp.asarray(rng2.standard_normal((n, h, w, c)), dtype=jnp.bfloat16)
    offs = jnp.asarray(rng2.uniform(-8, 8, (n, 2)).astype(np.float32))
    ref = warp_translate(imgs, offs, max_shift=MAX_SHIFT)
    got = warp_translate_pallas(imgs, offs, max_shift=MAX_SHIFT, interpret=True)
    assert got.dtype == jnp.bfloat16
    # the Pallas kernel blends in f32 and rounds once at the end; the XLA
    # path blends in bf16 — allow one-blend bf16 rounding
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.05,
    )


def test_warp_fn_gradients_match_xla(rng):
    """The custom-vjp wrapper routes gradients through the XLA path — both
    image and offset cotangents must match jax.grad of warp_translate."""
    rng2 = np.random.default_rng(2)
    n, h, w, c = 2, 8, 12, 3
    imgs = jnp.asarray(rng2.standard_normal((n, h, w, c)).astype(np.float32))
    offs = jnp.asarray(rng2.uniform(-3, 3, (n, 2)).astype(np.float32))
    fn = make_warp_translate_fn(max_shift=MAX_SHIFT)

    def loss_pallas(im, of):
        return jnp.sum(jnp.sin(fn(im, of)))

    def loss_xla(im, of):
        return jnp.sum(jnp.sin(warp_translate(im, of, max_shift=MAX_SHIFT)))

    gi, go = jax.grad(loss_pallas, argnums=(0, 1))(imgs, offs)
    ri, ro = jax.grad(loss_xla, argnums=(0, 1))(imgs, offs)
    np.testing.assert_allclose(np.asarray(gi), np.asarray(ri), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(go), np.asarray(ro), rtol=1e-4, atol=1e-5)


def test_lane_budget_assert():
    """W + 2*(max_shift+1) must fit the 128-lane register."""
    imgs = jnp.zeros((1, 4, 80, 2), jnp.float32)
    offs = jnp.zeros((1, 2), jnp.float32)
    with pytest.raises(AssertionError):
        warp_translate_pallas(imgs, offs, max_shift=26, interpret=True)
