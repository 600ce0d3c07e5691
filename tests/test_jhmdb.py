"""Sub-JHMDB dataset + PCK evaluation tests on a synthetic fixture."""

import json
import os
import os.path as osp
from collections import OrderedDict

import numpy as np
import pytest

from fami_pose_tpu.data.jhmdb import JHMDBDataset
from fami_pose_tpu.utils.registry import DATASET_REGISTRY

from fixtures import make_cfg, make_posetrack_fixture


@pytest.fixture()
def jhmdb_cfg(tmp_path):
    root = str(tmp_path)
    json_path, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                                people_per_frame=1)
    # rename jsons to the JHMDB names; 15-joint keypoints
    jdir = osp.join(root, "json")
    for split in ("train", "val"):
        src = osp.join(jdir, f"posetrack_{split}.json")
        with open(src) as f:
            data = json.load(f)
        for ann in data["annotations"]:
            ann["keypoints"] = ann["keypoints"][: 15 * 3]
        with open(osp.join(jdir, f"jhmdb_{split}.json"), "w") as f:
            json.dump(data, f)
    cfg = make_cfg(jdir, img_dir)
    cfg.DATASET.NAME = "JHMDB"
    cfg.MODEL.NUM_JOINTS = 15
    cfg.DISTANCE = 2
    return cfg


def test_registered():
    assert "JHMDB" in DATASET_REGISTRY and "Jhmdb" in DATASET_REGISTRY


def test_index_and_getitem(jhmdb_cfg):
    ds = JHMDBDataset(jhmdb_cfg, "train")
    assert len(ds) == 4
    np.random.seed(0)
    s = ds[0]
    assert s["kf"].shape == (128, 96, 3)
    assert s["sup"].shape == (128, 96, 6)  # DISTANCE=2 -> 2 sup frames
    assert s["joints"].shape == (15, 2)


def test_pck_evaluation_perfect(jhmdb_cfg):
    ds = JHMDBDataset(jhmdb_cfg, "validate")
    preds = np.zeros((len(ds), 15, 3), np.float32)
    img_path_map = OrderedDict()
    for i, item in enumerate(ds.data):
        preds[i, :, :2] = item["joints_3d"][:, :2]
        preds[i, :, 2] = 0.9
        img_path_map[item["image"]] = [i]
    boxes = np.zeros((len(ds), 6), np.float32)
    name_value, mean = ds.evaluate(
        jhmdb_cfg, preds, str(jhmdb_cfg.OUTPUT_DIR or "."), boxes, img_path_map
    )
    assert mean == pytest.approx(100.0)
    assert set(name_value.keys()) == {
        "Head", "Shoulder", "Elbow", "Wrist", "Hip", "Knee", "Ankle", "Mean",
    }


def test_pck_evaluation_off_by_far(jhmdb_cfg):
    ds = JHMDBDataset(jhmdb_cfg, "validate")
    preds = np.full((len(ds), 15, 3), 1e4, np.float32)
    img_path_map = OrderedDict(
        (item["image"], [i]) for i, item in enumerate(ds.data)
    )
    boxes = np.zeros((len(ds), 6), np.float32)
    _, mean = ds.evaluate(jhmdb_cfg, preds, ".", boxes, img_path_map)
    assert mean == pytest.approx(0.0)


@pytest.mark.slow
def test_jhmdb_runner_end_to_end(jhmdb_cfg, tmp_path):
    """Full engine on the 15-joint path: train 1 epoch -> eval PCK."""
    from fami_pose_tpu.models.hrnet import TINY_EXTRA
    from fami_pose_tpu.engine.runner import Runner

    cfg = jhmdb_cfg
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = TINY_EXTRA
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DCN_OFFSET_GROUPS = 4
    cfg.TPU.DCN_MAX_OFFSET = 2
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 4
    cfg.TRAIN.END_EPOCH = 1
    cfg.VAL.BATCH_SIZE_PER_GPU = 4
    cfg.OUTPUT_DIR = str(tmp_path / "out")
    cfg.EXPERIMENT_NAME = "jhmdb_smoke"

    runner = Runner(cfg)
    results = runner.launch(train=True, val=True)
    (path, tables), = results["val"].items()
    for tag in ("final", "backbone"):
        name_value, mean = tables[tag]
        assert np.isfinite(mean)
        assert "Wrist" in name_value
