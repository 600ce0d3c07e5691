"""Int8 PTQ eval path (models/quant.py): off-mode parity, calibration flow,
scale conversion, and end-to-end int8 accuracy on the tiny topology."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fami_pose_tpu.models.quant import (
    QuantConv,
    calibrate,
    conv2d,
    quant_scales_from_stats,
)


@pytest.fixture
def rng():
    return np.random.RandomState(7)


def test_off_mode_matches_nn_conv_bitwise(rng):
    """quant='off' must reproduce nn.Conv exactly: same param tree, same
    output bits — the default path may not change at all."""
    x = jnp.asarray(rng.randn(2, 8, 8, 6).astype(np.float32))
    for dtype in (jnp.float32, jnp.bfloat16):
        for use_bias, ksize, stride, dil in [
            (False, 3, 1, 1), (True, 3, 2, 1), (True, 1, 1, 1), (False, 3, 1, 3),
        ]:
            p = dil if ksize == 3 else 0
            ref = nn.Conv(
                5, (ksize, ksize), strides=(stride, stride),
                padding=((p, p), (p, p)), kernel_dilation=(dil, dil),
                use_bias=use_bias, dtype=dtype, param_dtype=jnp.float32,
            )
            q = conv2d(
                "calibrate", 5, ksize, strides=stride, padding=((p, p), (p, p)),
                kernel_dilation=dil, use_bias=use_bias, dtype=dtype,
            )
            v_ref = ref.init(jax.random.PRNGKey(3), x)
            y_ref = ref.apply(v_ref, x)
            # same param tree => ref params drop straight in
            vq = {"params": v_ref["params"]}
            y_q, muts = q.apply(vq, x, mutable=["quant_stats"])
            np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_q))
            absmax = float(muts["quant_stats"]["act_absmax"])
            assert absmax == pytest.approx(float(jnp.max(jnp.abs(x))))


def test_quant_conv_int8_close_to_f32(rng):
    x = jnp.asarray((rng.randn(2, 16, 16, 8) * 1.7).astype(np.float32))
    q_cal = QuantConv(8, (3, 3), padding=((1, 1), (1, 1)), quant="calibrate")
    v = q_cal.init(jax.random.PRNGKey(0), x)
    y_f32, muts = q_cal.apply({"params": v["params"]}, x, mutable=["quant_stats"])
    quant = quant_scales_from_stats(muts["quant_stats"])
    q_int8 = QuantConv(8, (3, 3), padding=((1, 1), (1, 1)), quant="int8")
    y_q = q_int8.apply({"params": v["params"], "quant": quant}, x)
    ref = np.asarray(y_f32)
    err = np.abs(np.asarray(y_q) - ref).max()
    # per-channel weights + per-tensor act: expect ~1% of range on random data
    assert err < 0.05 * np.abs(ref).max()


def test_quant_scales_from_stats_structure():
    stats = {"a": {"act_absmax": jnp.float32(12.7)},
             "b": {"c": {"act_absmax": jnp.float32(0.0)}}}
    q = quant_scales_from_stats(stats, margin=2.0)
    assert q["a"]["act_scale"] == pytest.approx(12.7 * 2.0 / 127.0)
    # zero absmax (dead conv input) must still give a positive scale
    assert float(q["b"]["c"]["act_scale"]) > 0


def test_hrnet_int8_end_to_end(rng):
    """Calibrate-then-int8 on the tiny HRNet: runs, finite, and close to the
    f32 forward (heatmap argmax agreement is what eval actually needs)."""
    from fami_pose_tpu.models.hrnet import HRNet, TINY_EXTRA

    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    base = HRNet(extra=TINY_EXTRA, num_joints=17)
    v = base.init(jax.random.PRNGKey(1), x)
    hm_ref, _ = base.apply(v, x)

    cal = HRNet(extra=TINY_EXTRA, num_joints=17, quant="calibrate")
    quant = calibrate(cal, v, [(x,)])

    q = HRNet(extra=TINY_EXTRA, num_joints=17, quant="int8")
    hm_q, _ = q.apply({**v, "quant": quant}, x)

    ref, got = np.asarray(hm_ref), np.asarray(hm_q)
    assert np.isfinite(got).all()
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.1 * scale
    # argmax locations (what decode consumes) mostly agree
    r = ref.reshape(2, -1, 17).argmax(axis=1)
    g = got.reshape(2, -1, 17).argmax(axis=1)
    assert (r == g).mean() > 0.85


def test_fami_pose_int8_smoke(rng):
    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import TINY_EXTRA

    kf = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    sup = jnp.asarray(rng.rand(1, 64, 64, 6).astype(np.float32))
    kw = dict(extra=TINY_EXTRA, num_joints=17, feat_channels=8,
              dcn_offset_groups=4)
    base = FAMIPose(**kw)
    v = base.init(jax.random.PRNGKey(0), kf, sup, train=False)
    hm_ref, _ = base.apply(v, kf, sup, train=False)

    quant = calibrate(
        FAMIPose(**kw, backbone_quant="calibrate"), v, [(kf, sup)],
        train=False,
    )
    hm_q, _ = FAMIPose(**kw, backbone_quant="int8").apply(
        {**v, "quant": quant}, kf, sup, train=False
    )
    ref, got = np.asarray(hm_ref), np.asarray(hm_q)
    assert np.isfinite(got).all()
    assert np.abs(got - ref).max() < 0.2 * np.abs(ref).max()


def test_from_config_int8_eval_phase_gating():
    from fami_pose_tpu.config import get_default_cfg
    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.utils.registry import TRAIN_PHASE

    cfg = get_default_cfg()
    cfg.TPU.INT8_EVAL = True
    m_eval = FAMIPose.from_config(cfg, phase="val")
    assert m_eval.backbone_quant == "int8"
    m_train = FAMIPose.from_config(cfg, phase=TRAIN_PHASE)
    assert m_train.backbone_quant == "off"
    cfg.TPU.INT8_EVAL = False
    assert FAMIPose.from_config(cfg, phase="val").backbone_quant == "off"


@pytest.mark.slow
def test_evaluator_int8_e2e(tmp_path):
    """TPU.INT8_EVAL through the real Evaluator on the synthetic fixture:
    calibration on the first eval batches, then a full int8 eval sweep."""
    import os.path as osp
    import sys

    sys.path.insert(0, osp.dirname(__file__))
    from fixtures import make_posetrack_fixture
    from test_end_to_end import _tiny_cfg, _write_gt_annolists

    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1)
    cfg = _tiny_cfg(root, img_dir)
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_CALIB_BATCHES = 1
    cfg.VAL.ANNOT_DIR = _write_gt_annolists(root, img_dir, cfg)
    cfg.VAL.USE_GT_BBOX = True

    from fami_pose_tpu.engine.evaluator import Evaluator

    ev = Evaluator(cfg)
    assert ev.model.backbone_quant == "int8"
    variables = jax.jit(
        lambda: ev.model.init(jax.random.PRNGKey(0), *ev._example, train=False)
    )()
    with_quant = ev._maybe_calibrate_int8(dict(variables))
    assert "quant" in with_quant
    # scales are calibrated (not the init default of 1.0) and positive
    leaves = jax.tree.leaves(with_quant["quant"])
    assert leaves and all(float(s) > 0 for s in leaves)
    results = ev.eval_checkpoint(dict(variables))
    name_value, mean = results["final"]
    assert np.isfinite(mean)
