"""Tests for auxiliary components: core-function registry, PCKh, optional
losses, offset target generator, MOTA wiring, metric writer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.config import get_default_cfg
from fami_pose_tpu.engine.core_functions import build_core_function
from fami_pose_tpu.evaluation.pckh import evaluate_pckh
from fami_pose_tpu.evaluation.poseval_data import N_JOINTS
from fami_pose_tpu.data.target_generators import generate_offset_targets
from fami_pose_tpu.losses import (
    integral_l1_loss,
    soft_argmax,
    structure_cosine_loss,
)


def test_core_function_registry():
    cfg = get_default_cfg()
    cfg.CORE_FUNCTION = "AlignmentMIFunction_Term6_V1"
    fn = build_core_function(cfg)
    assert hasattr(fn, "build_train_step") and hasattr(fn, "build_eval_step")
    cfg.CORE_FUNCTION = "nope"
    with pytest.raises(KeyError):
        build_core_function(cfg)


def test_soft_argmax_peak():
    hm = np.zeros((1, 16, 16, 2), np.float32)
    hm[0, 4, 12, 0] = 30.0  # sharp peak -> expectation ~ peak
    hm[0, 10, 2, 1] = 30.0
    coords = np.asarray(soft_argmax(jnp.asarray(hm), temperature=0.1))
    np.testing.assert_allclose(coords[0, 0], [(12 + 0.5) / 16, (4 + 0.5) / 16], atol=0.02)
    np.testing.assert_allclose(coords[0, 1], [(2 + 0.5) / 16, (10 + 0.5) / 16], atol=0.02)


def test_integral_l1_zero_when_matching():
    hm = np.zeros((1, 16, 16, 17), np.float32)
    joints = np.zeros((1, 17, 2), np.float32)
    for j in range(17):
        y, x = 2 + (j % 12), 3 + (j % 10)
        hm[0, y, x, j] = 50.0
        joints[0, j] = [(x + 0.5) * 4, (y + 0.5) * 4]  # input px at stride 4
    loss = integral_l1_loss(
        jnp.asarray(hm), jnp.asarray(joints), image_size=(64, 64)
    )
    assert float(loss) < 0.01


def test_structure_cosine_in_range(rng):
    hm = jnp.asarray(rng.rand(2, 16, 16, 17).astype(np.float32))
    joints = jnp.asarray(rng.rand(2, 17, 2).astype(np.float32) * 64)
    w = jnp.ones((2, 17))
    loss = structure_cosine_loss(hm, joints, w, image_size=(64, 64))
    assert 0.0 <= float(loss) <= 2.0


def test_offset_targets():
    ja = np.array([[[4.0, 4.0], [10.0, 2.0]]], np.float32)
    jb = np.array([[[6.0, 5.0], [10.0, 2.0]]], np.float32)
    vis = np.ones((1, 2), np.float32)
    off, w = generate_offset_targets(
        jnp.asarray(ja), jnp.asarray(jb), jnp.asarray(vis),
        output_size=(16, 16), radius=2, per_pixel=False,
    )
    off, w = np.asarray(off), np.asarray(w)
    assert off.shape == (1, 16, 16, 2, 2) and w.shape == (1, 16, 16, 2)
    # inside the radius of joint 0, offset == (2, 1)
    assert w[0, 4, 4, 0] == 1.0
    np.testing.assert_allclose(off[0, 4, 4, 0], [2.0, 1.0])
    # outside the radius, zero weight
    assert w[0, 12, 12, 0] == 0.0
    # stationary joint -> zero offsets
    np.testing.assert_allclose(off[0, 2, 10, 1], [0.0, 0.0])


def test_pckh_perfect_and_partial():
    def rect(joints, track=0):
        pts = [
            {"id": [j], "x": [float(x)], "y": [float(y)]}
            for j, (x, y) in joints.items()
        ]
        return {
            "x1": [0.0], "y1": [0.0], "x2": [20.0], "y2": [20.0],
            "track_id": [track], "annopoints": [{"point": pts}],
        }

    gt_j = {j: (15.0 * j, 10.0) for j in range(N_JOINTS)}
    gt = [{"annorect": [rect(gt_j)], "seq_id": 0}]
    pr = [{"annorect": [rect(gt_j)], "seq_id": 0}]
    pckh = evaluate_pckh(gt, pr)
    np.testing.assert_allclose(pckh[: N_JOINTS + 1], 100.0)

    bad = dict(gt_j)
    bad[0] = (500.0, 500.0)
    pr2 = [{"annorect": [rect(bad)], "seq_id": 0}]
    pckh2 = evaluate_pckh(gt, pr2)
    assert pckh2[0] == 0.0 and pckh2[1] == 100.0


def test_evaluator_dark_decode_flag(tmp_path):
    """POST_PROCESS selects the DARK decode path."""
    from fami_pose_tpu.ops.heatmap import dark_get_final_preds, get_final_preds
    import fami_pose_tpu.engine.evaluator as ev

    # check wiring only (full evaluator needs a dataset)
    cfg = get_default_cfg()
    cfg.VAL.POST_PROCESS = True
    src = open(ev.__file__).read()
    assert "dark_get_final_preds" in src and "POST_PROCESS" in src


def test_get_final_preds_coord():
    from fami_pose_tpu.ops.coords import get_final_preds_coord

    b, j = 2, 5
    kp = np.zeros((b, j, 3), np.float32)
    kp[..., 0] = 0.0   # center of the heatmap in normalized coords
    kp[..., 1] = 0.0
    kp[..., 2] = 0.7
    center = np.tile(np.array([[100.0, 80.0]], np.float32), (b, 1))
    scale = np.tile(np.array([[1.0, 1.0]], np.float32), (b, 1))
    preds, maxvals = get_final_preds_coord(
        jnp.asarray(kp), jnp.asarray(center), jnp.asarray(scale), (48, 64)
    )
    # the heatmap center maps to the box center
    np.testing.assert_allclose(np.asarray(preds)[0, 0], [100.0, 80.0], atol=3.0)
    np.testing.assert_allclose(np.asarray(maxvals), 0.7)


def test_named_initializers():
    import jax
    from fami_pose_tpu.models.weight_init import get_initializer

    for name in ("kaiming", "xavier", "normal", "uniform", "constant", "lecun"):
        init = get_initializer(name, value=1.5)
        w = init(jax.random.PRNGKey(0), (8, 8), jnp.float32)
        assert w.shape == (8, 8)
    with pytest.raises(KeyError):
        get_initializer("bogus")


@pytest.mark.slow
def test_deform_block_variants(rng):
    from fami_pose_tpu.models.deform_blocks import (
        AdaptBlock,
        AdaptBlockV2,
        DeformBlock,
    )

    x = jnp.asarray(rng.rand(1, 8, 8, 6).astype(np.float32))
    for cls, kw in (
        (AdaptBlock, {}),
        (AdaptBlockV2, {"deformable_groups": 2}),
        (DeformBlock, {}),
    ):
        m = cls(features=6, **kw)
        v = m.init(jax.random.PRNGKey(0), x, train=False)
        out = m.apply(v, x, train=False)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())
    # zero affine transform + zero translation == regular grid == plain conv
    from fami_pose_tpu.models.deform_blocks import _affine_offsets

    t = jnp.zeros((1, 4, 4, 4))
    tr = jnp.zeros((1, 4, 4, 2))
    off = _affine_offsets(t, tr)
    # offset = (0 @ reg) - reg + 0 = -reg: transformed grid collapses to center
    assert off.shape == (1, 4, 4, 18)
    np.testing.assert_allclose(np.asarray(off[0, 0, 0, 0]), 1.0)  # -(-1)
