"""TPU.DCN_AUTO_WINDOW: the DCN window is calibrated per checkpoint.

The articulated-fixture A/B (docs/DCN_OFFSET_BOUND.md) measured a real AP
cost (−0.65 mean) for a window smaller than the trained offset range, and
exactness whenever the window covers it (the clamp never engages). So the
serving window must be derived from the checkpoint's measured offset-conv
outputs, not shipped as a static default. These tests drive the Evaluator's
calibration across the three regimes:

  * collapsed offsets (pinned 0.3 px)   -> D = 1 (tightest window)
  * hot offsets (pinned 4.6 px)         -> D = 5 (smallest cover)
  * beyond DCN_AUTO_WINDOW_MAX          -> exact gather fallback
"""

import os.path as osp

import jax
import numpy as np
import pytest

from fixtures import make_cfg, make_posetrack_fixture


def _evaluator(root, img_dir, auto=True, cap=8):
    from fami_pose_tpu.engine.evaluator import Evaluator
    from fami_pose_tpu.models.hrnet import TINY_EXTRA

    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = TINY_EXTRA
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DCN_OFFSET_GROUPS = 4
    cfg.TPU.DCN_MAX_OFFSET = 2
    cfg.TPU.DCN_AUTO_WINDOW = auto
    cfg.TPU.DCN_AUTO_WINDOW_MAX = cap
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.VAL.BATCH_SIZE_PER_GPU = 4
    cfg.VAL.USE_GT_BBOX = True
    cfg.OUTPUT_DIR = osp.join(root, "out")
    from test_end_to_end import _write_gt_annolists

    cfg.VAL.ANNOT_DIR = _write_gt_annolists(root, img_dir, cfg)
    return Evaluator(cfg)


def _init_variables(ev):
    v = jax.jit(
        lambda: ev.model.init(jax.random.PRNGKey(0), *ev._example,
                              train=False)
    )()
    return jax.device_get(v)


def _pin_offset_heads(variables, value):
    """Make every dcn_offset conv emit exactly ``value`` px: zero its
    kernel, set its bias (deterministic control of the measured max)."""

    def pin(path, leaf):
        if not any(
            "dcn_offset" in str(getattr(p, "key", "")) for p in path
        ):
            return leaf
        leaf = np.asarray(leaf)
        is_bias = str(getattr(path[-1], "key", "")) == "bias"
        return np.full_like(leaf, value) if is_bias else np.zeros_like(leaf)

    return jax.tree_util.tree_map_with_path(pin, variables)


def test_auto_window_tightens_on_collapsed_offsets(tmp_path):
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=3,
                                        people_per_frame=1)
    ev = _evaluator(root, img_dir)
    variables = _pin_offset_heads(_init_variables(ev), 0.3)
    ev._maybe_auto_window(variables)
    # sub-pixel offsets (collapsed head) -> smallest window
    assert ev.model.dcn_max_offset == 1
    res = ev.eval_checkpoint(dict(variables))
    assert "final" in res  # the rebuilt eval step runs end to end


def test_auto_window_covers_hot_offsets(tmp_path):
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=3,
                                        people_per_frame=1)
    ev = _evaluator(root, img_dir)
    variables = _pin_offset_heads(_init_variables(ev), 4.6)
    ev._maybe_auto_window(variables)
    # max |offset| = 4.6 px -> smallest covering integer window
    assert ev.model.dcn_max_offset == 5


def test_auto_window_falls_back_to_exact_beyond_cap(tmp_path):
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=3,
                                        people_per_frame=1)
    ev = _evaluator(root, img_dir, cap=4)
    variables = _pin_offset_heads(_init_variables(ev), 4.6)
    ev._maybe_auto_window(variables)
    assert ev.model.dcn_max_offset is None  # exact unbounded gather


def test_auto_window_off_by_default(tmp_path):
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=3,
                                        people_per_frame=1)
    ev = _evaluator(root, img_dir, auto=False)
    variables = _init_variables(ev)
    ev._maybe_auto_window(variables)
    assert ev.model.dcn_max_offset == 2  # untouched static config
