"""The shipped serving config (VERDICT r4 missing #5).

``configs/posetrack18/fami_pose_serving.yaml`` is the one-command product
surface for the measured serving levers — int8 PTQ and per-checkpoint DCN
window calibration (each licensed by a recorded trained-weights A/B, see
the YAML header + docs/SERVING.md). Flip-test stays ON: the r5 flip A/B on
a flip-trained sub-saturation checkpoint measured it at +3.9 AP, so
dropping the flipped forward is a per-checkpoint opt-in, never a shipped
default. These tests pin (a) that the file merges into the default tree
with exactly those levers on and (b) that the full Runner --val path
executes end to end with them.
"""

import os
import os.path as osp

import numpy as np
import pytest

from fixtures import make_cfg, make_posetrack_fixture

HERE = osp.dirname(osp.abspath(__file__))
SERVING_YAML = osp.join(
    HERE, "..", "configs", "posetrack18", "fami_pose_serving.yaml"
)


def test_serving_yaml_merges_with_levers_on():
    from fami_pose_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    cfg.merge_from_file(SERVING_YAML)
    # the two shipped serving levers
    assert cfg.TPU.INT8_EVAL is True
    assert cfg.TPU.DCN_AUTO_WINDOW is True
    # flip-test must stay ON (r5 flip A/B: +3.9 AP on a flip-trained
    # checkpoint — the no-flip lever is opt-in per checkpoint, and the
    # serving file must NOT ship it). FLIP_VAL/FLIP_TEST are the knobs
    # the evaluator reads (engine/evaluator.py).
    assert cfg.VAL.FLIP_VAL is True
    assert cfg.TEST.FLIP_TEST is True
    # inherits the training config's model + dataset tree via _BASE_
    assert cfg.MODEL.NAME == "FAMIPose"
    assert cfg.DATASET.IS_POSETRACK18 is True
    assert cfg.EXPERIMENT_NAME == "fami_pose_pt18_serving"
    # parity config keeps the serving levers off (the serving file must
    # not leak defaults)
    base = get_default_cfg()
    base.merge_from_file(
        osp.join(HERE, "..", "configs", "posetrack18", "fami_pose.yaml")
    )
    assert base.TPU.INT8_EVAL is False
    assert base.TPU.DCN_AUTO_WINDOW is False


@pytest.mark.slow
def test_serving_levers_end_to_end(tmp_path):
    """Runner train(1 epoch) -> val with the serving levers on the synthetic
    fixture: int8 model built, quant calibration ran, auto-window picked a
    window, flip-test eval step, finite AP tables."""
    from test_end_to_end import _tiny_cfg, _write_gt_annolists

    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1)
    cfg = _tiny_cfg(root, img_dir)
    annot_dir = _write_gt_annolists(root, img_dir, cfg)
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    # the serving levers (what fami_pose_serving.yaml turns on; flip-test
    # comes from the YAML there — the fixture cfg bypasses the _BASE_
    # chain, so turn it on explicitly to exercise the same eval step)
    cfg.TPU.INT8_EVAL = True
    cfg.TPU.INT8_CALIB_BATCHES = 1
    cfg.TPU.DCN_AUTO_WINDOW = True
    cfg.VAL.FLIP_VAL = True

    from fami_pose_tpu.engine.runner import Runner

    runner = Runner(cfg)
    results = runner.launch(train=True, val=True)
    assert any(
        c.startswith("epoch_")
        for c in os.listdir(runner.dirs["checkpoints"])
    )
    (path, tables), = results["val"].items()
    for tag in ("final", "backbone"):
        name_value, mean = tables[tag]
        assert np.isfinite(mean)
