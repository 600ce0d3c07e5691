"""End-to-end engine smoke test: Runner trains, checkpoints, and evaluates a
tiny FAMIPose on the synthetic PoseTrack fixture."""

import json
import os
import os.path as osp

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from fami_pose_tpu.data.keypoints import coco2posetrack_ord_infer
from fixtures import make_cfg, make_posetrack_fixture


def _tiny_cfg(root, img_dir):
    from fami_pose_tpu.models.hrnet import TINY_EXTRA

    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = TINY_EXTRA
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DCN_OFFSET_GROUPS = 4
    cfg.TPU.DCN_MAX_OFFSET = 2
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 4
    cfg.TRAIN.BEGIN_EPOCH = 0
    cfg.TRAIN.END_EPOCH = 1
    cfg.TRAIN.AUTO_RESUME = True
    cfg.VAL.BATCH_SIZE_PER_GPU = 4
    cfg.PRINT_FREQ = 2
    cfg.OUTPUT_DIR = osp.join(root, "out")
    cfg.EXPERIMENT_NAME = "smoke"
    return cfg


def _write_gt_annolists(root, img_dir, cfg):
    """GT annolists derived from the fixture's COCO-17 keypoints."""
    from fami_pose_tpu.data.coco_json import COCOJson

    coco = COCOJson(osp.join(root, "json", "posetrack_val.json"))
    annot_dir = osp.join(root, "gt_annolist")
    os.makedirs(annot_dir, exist_ok=True)
    by_video = {}
    for img_id in coco.getImgIds():
        im = coco.loadImgs(img_id)[0]
        video = osp.dirname(im["file_name"])
        rects = []
        for ann in coco.loadAnns(coco.getAnnIds(imgIds=img_id)):
            kps = np.array(ann["keypoints"], np.float64).reshape(17, 3)
            pt15 = coco2posetrack_ord_infer(kps)
            pts = [
                {"id": [j], "x": [float(x)], "y": [float(y)]}
                for j, (x, y, s) in enumerate(pt15)
            ]
            bx, by_, bw, bh = ann["bbox_head"]
            rects.append(
                {
                    "x1": [bx], "y1": [by_], "x2": [bx + bw], "y2": [by_ + bh],
                    "track_id": [ann["track_id"]], "score": [1.0],
                    "annopoints": [{"point": pts}],
                }
            )
        by_video.setdefault(video, []).append(
            {"image": [{"name": "images/" + im["file_name"]}], "annorect": rects}
        )
    for video, frames in by_video.items():
        with open(osp.join(annot_dir, osp.basename(video) + ".json"), "w") as f:
            json.dump({"annolist": frames}, f)
    return annot_dir


@pytest.mark.slow
def test_runner_train_then_eval(tmp_path):
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1)
    cfg = _tiny_cfg(root, img_dir)
    annot_dir = _write_gt_annolists(root, img_dir, cfg)
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    cfg.VAL.POST_PROCESS = True  # exercise the DARK decode path
    cfg.VAL.FLIP_VAL = True      # and flip-test averaging

    from fami_pose_tpu.engine.runner import Runner

    runner = Runner(cfg)
    results = runner.launch(train=True, val=True)

    # a checkpoint was written and training state advanced
    ckpts = os.listdir(runner.dirs["checkpoints"])
    assert any(c.startswith("epoch_") for c in ckpts)
    assert int(results["train"].step) > 0

    # evaluation produced grouped AP tables for final + backbone heatmaps
    (path, tables), = results["val"].items()
    for tag in ("final", "backbone"):
        name_value, mean = tables[tag]
        assert set(name_value.keys()) == {
            "Head", "Shoulder", "Elbow", "Wrist", "Hip", "Knee", "Ankle", "Mean",
        }
        assert np.isfinite(mean)

    # output-dir naming contract: OUTPUT_DIR/EXPERIMENT/dataset-tag/hyper
    assert "smoke" in cfg.OUTPUT_DIR and "PoseTrack17" in cfg.OUTPUT_DIR
    assert "bbox_1.25" in cfg.OUTPUT_DIR


@pytest.mark.slow
def test_runner_train_then_eval_device_crop(tmp_path):
    """Same Runner smoke, with TPU.DEVICE_CROP: the trainer/evaluator must
    dispatch to the on-device crop-warp batch prep."""
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1)
    cfg = _tiny_cfg(root, img_dir)
    cfg.TPU.DEVICE_CROP = True
    cfg.TPU.DEVICE_CROP_CANVAS = [192, 192]
    annot_dir = _write_gt_annolists(root, img_dir, cfg)
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True

    from fami_pose_tpu.engine.runner import Runner

    runner = Runner(cfg)
    results = runner.launch(train=True, val=True)
    assert int(results["train"].step) > 0
    (path, tables), = results["val"].items()
    name_value, mean = tables["final"]
    assert np.isfinite(mean)


@pytest.mark.slow
def test_runner_test_phase(tmp_path):
    """--test phase: Evaluator built from cfg.TEST (reference runner.py:59-66
    dispatch order train -> val -> test)."""
    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1)
    cfg = _tiny_cfg(root, img_dir)
    annot_dir = _write_gt_annolists(root, img_dir, cfg)
    cfg.TEST.ANNOT_DIR = annot_dir
    cfg.TEST.USE_GT_BBOX = True
    cfg.TEST.BATCH_SIZE_PER_GPU = 4

    from fami_pose_tpu.engine.runner import Runner

    runner = Runner(cfg)

    # seed one checkpoint for the sweep (the test phase evaluates existing
    # checkpoints; without training there would be none)
    import jax
    import jax.numpy as jnp

    from fami_pose_tpu.engine import checkpoints
    from fami_pose_tpu.engine.train_state import create_train_state
    from fami_pose_tpu.models.build import build_model
    from fami_pose_tpu.optim import build_optimizer

    model = build_model(cfg, "train")
    tx = build_optimizer(cfg, steps_per_epoch=1)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, 128, 96, 3)), jnp.zeros((1, 128, 96, 12))),
    )
    checkpoints.save_checkpoint(runner.dirs["checkpoints"], 0, state)

    results = runner.launch(test=True)
    (path, tables), = results["test"].items()
    name_value, mean = tables["final"]
    assert np.isfinite(mean)
    # the test phase writes its own log file
    import glob
    assert glob.glob(osp.join(runner.dirs["log"], "test-*.log"))
