"""End-to-end PoseTrackDataset.evaluate test: synthetic GT annolists +
predictions that convert exactly onto them -> 100 AP."""

import json
import os
import os.path as osp
from collections import OrderedDict

import numpy as np
import pytest

from fami_pose_tpu.data.keypoints import COCO_JOINTS, POSETRACK_JOINTS
from fami_pose_tpu.data.posetrack import PoseTrackDataset
from fixtures import make_cfg, make_posetrack_fixture


def _consistent_pose(rng, base_x, base_y):
    """PT15 GT joints + the COCO-17 pose that converts exactly onto them."""
    joints = {}
    for j in range(12):
        joints[j] = (base_x + 17.0 * j, base_y + 11.0 * j)
    ls, rs = joints[9], joints[8]
    neck = ((ls[0] + rs[0]) / 2, (ls[1] + rs[1]) / 2)
    nose = (neck[0] + 9.0, neck[1] - 13.0)
    head_top = (2 * nose[0] - neck[0], 2 * nose[1] - neck[1])
    joints[12], joints[13], joints[14] = neck, nose, head_top

    xy17 = np.zeros((17, 2))
    for pt_id, name in enumerate(POSETRACK_JOINTS):
        if name in COCO_JOINTS:
            xy17[COCO_JOINTS.index(name)] = joints[pt_id]
    xy17[COCO_JOINTS.index("nose")] = nose
    return joints, xy17


def test_dataset_evaluate_perfect(tmp_path):
    root = str(tmp_path)
    json_path, img_dir = make_posetrack_fixture(root, n_videos=2, n_frames=4)
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    annot_dir = osp.join(root, "gt_annolist")
    os.makedirs(annot_dir)
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True

    ds = PoseTrackDataset(cfg, "validate")

    # GT annolists + aligned predictions, one person per frame
    rng = np.random.RandomState(0)
    preds = []
    img_path_map = OrderedDict()
    for v in range(2):
        video = f"video_{v:04d}"
        annolist = []
        for f in range(1, 5):
            img_sfx = f"images/{video}/{f:08d}.jpg"
            joints, xy17 = _consistent_pose(rng, 30.0 + 5 * v, 40.0 + 2 * f)
            pts = [
                {"id": [j], "x": [float(x)], "y": [float(y)]}
                for j, (x, y) in joints.items()
            ]
            annolist.append(
                {
                    "image": [{"name": img_sfx}],
                    "annorect": [
                        {
                            "x1": [0.0], "y1": [0.0], "x2": [25.0], "y2": [25.0],
                            "track_id": [0], "score": [1.0],
                            "annopoints": [{"point": pts}],
                        }
                    ],
                }
            )
            idx = len(preds)
            pred = np.zeros((17, 3))
            pred[:, :2] = xy17
            pred[:, 2] = 0.9
            preds.append(pred)
            img_path_map[osp.join(img_dir, video, f"{f:08d}.jpg")] = [idx]
        with open(osp.join(annot_dir, f"{video}.json"), "w") as fh:
            json.dump({"annolist": annolist}, fh)

    preds = np.stack(preds)
    boxes = np.tile(np.array([[50, 50, 1, 1, 100, 0.9]]), (len(preds), 1))
    out_dir = osp.join(root, "out_json")
    name_value, mean = ds.evaluate(cfg, preds, out_dir, boxes, img_path_map)
    assert set(name_value.keys()) == {
        "Head", "Shoulder", "Elbow", "Wrist", "Hip", "Knee", "Ankle", "Mean",
    }
    assert mean == pytest.approx(100.0)
    # prediction files mirror GT file names
    assert sorted(os.listdir(out_dir)) == ["video_0000.json", "video_0001.json"]


def test_dataset_evaluate_missing_frames_get_dummies(tmp_path):
    """Frames without predictions must still appear (dummy detection)."""
    root = str(tmp_path)
    json_path, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4)
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    annot_dir = osp.join(root, "gt_annolist")
    os.makedirs(annot_dir)
    cfg.VAL.ANNOT_DIR = annot_dir
    ds = PoseTrackDataset(cfg, "validate")

    rng = np.random.RandomState(0)
    video = "video_0000"
    annolist = []
    for f in range(1, 5):
        joints, _ = _consistent_pose(rng, 30.0, 40.0)
        pts = [{"id": [j], "x": [float(x)], "y": [float(y)]} for j, (x, y) in joints.items()]
        annolist.append(
            {
                "image": [{"name": f"images/{video}/{f:08d}.jpg"}],
                "annorect": [{
                    "x1": [0.0], "y1": [0.0], "x2": [25.0], "y2": [25.0],
                    "track_id": [0], "score": [1.0],
                    "annopoints": [{"point": pts}],
                }],
            }
        )
    with open(osp.join(annot_dir, f"{video}.json"), "w") as fh:
        json.dump({"annolist": annolist}, fh)

    # predictions only for frame 2
    _, xy17 = _consistent_pose(rng, 30.0, 40.0)
    preds = np.zeros((1, 17, 3))
    preds[0, :, :2] = xy17
    preds[0, :, 2] = 0.9
    img_path_map = OrderedDict(
        {osp.join(img_dir, video, "00000002.jpg"): [0]}
    )
    boxes = np.array([[50, 50, 1, 1, 100, 0.9]])
    out_dir = osp.join(root, "out_json")
    name_value, mean = ds.evaluate(cfg, preds, out_dir, boxes, img_path_map)
    with open(osp.join(out_dir, f"{video}.json")) as fh:
        written = json.load(fh)
    assert len(written["annolist"]) == 4
    # 3 dummy frames
    dummies = [
        fr for fr in written["annolist"]
        if fr["annorect"][0]["annopoints"][0]["point"][0].get("score") == [-100.0]
    ]
    assert len(dummies) == 3
    assert 0.0 <= mean <= 100.0


def test_dataset_evaluate_with_tracking(tmp_path):
    """eval_track=True surfaces the per-joint MOTA table alongside AP
    (perfect predictions with consistent track ids -> MOTA 100)."""
    root = str(tmp_path)
    json_path, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4)
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    annot_dir = osp.join(root, "gt_annolist")
    os.makedirs(annot_dir)
    cfg.VAL.ANNOT_DIR = annot_dir
    cfg.VAL.USE_GT_BBOX = True
    ds = PoseTrackDataset(cfg, "validate")

    rng = np.random.RandomState(0)
    preds = []
    img_path_map = OrderedDict()
    video = "video_0000"
    annolist = []
    for f in range(1, 5):
        img_sfx = f"images/{video}/{f:08d}.jpg"
        joints, xy17 = _consistent_pose(rng, 30.0, 40.0 + 2 * f)
        pts = [
            {"id": [j], "x": [float(x)], "y": [float(y)]}
            for j, (x, y) in joints.items()
        ]
        annolist.append(
            {
                "image": [{"name": img_sfx}],
                "annorect": [
                    {
                        "x1": [0.0], "y1": [0.0], "x2": [25.0], "y2": [25.0],
                        "track_id": [0], "score": [1.0],
                        "annopoints": [{"point": pts}],
                    }
                ],
            }
        )
        idx = len(preds)
        pred = np.zeros((17, 3))
        pred[:, :2] = xy17
        pred[:, 2] = 0.9
        preds.append(pred)
        img_path_map[osp.join(img_dir, video, f"{f:08d}.jpg")] = [idx]
    with open(osp.join(annot_dir, f"{video}.json"), "w") as fh:
        json.dump({"annolist": annolist}, fh)

    preds = np.stack(preds)
    boxes = np.tile(np.array([[50, 50, 1, 1, 100, 0.9]]), (len(preds), 1))
    name_value, mean = ds.evaluate(
        cfg, preds, osp.join(root, "out_json"), boxes, img_path_map,
        eval_track=True,
    )
    assert mean == pytest.approx(100.0)          # AP mean unchanged
    assert name_value["MOTA_Mean"] == pytest.approx(100.0)
    assert "MOTA_Head" in name_value and "MOTA_Ankle" in name_value
