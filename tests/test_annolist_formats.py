"""PoseTrack18 COCO-style GT json -> annolist conversion + CLI smoke."""

import json
import os.path as osp
import subprocess
import sys

import numpy as np
import pytest

from fami_pose_tpu.evaluation.poseval_data import (
    JOINT_NAMES,
    load_annolist_file,
    load_data_dir,
)

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))


def _coco_style_gt(tmp_path):
    """A PoseTrack18-style COCO json with head_bottom/head_top slots."""
    kp_names = [
        "nose", "head_bottom", "head_top", "left_ear", "right_ear",
        "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
        "left_wrist", "right_wrist", "left_hip", "right_hip",
        "left_knee", "right_knee", "left_ankle", "right_ankle",
    ]
    kps = []
    for slot in range(17):
        kps += [10.0 * slot + 5, 6.0 * slot + 3, 1]
    # zero out the ears (no PT15 slot anyway)
    kps[3 * 3 : 3 * 3 + 3] = [0, 0, 0]
    kps[4 * 3 : 4 * 3 + 3] = [0, 0, 0]
    data = {
        "images": [
            {
                "id": 1,
                "file_name": "images/val/seq1/000001.jpg",
                "ignore_regions_x": [[0, 3, 3, 0]],
                "ignore_regions_y": [[900, 900, 990, 990]],
            }
        ],
        "annotations": [
            {
                "image_id": 1,
                "track_id": 0,
                "bbox_head": [4.0, 2.0, 20.0, 22.0],
                "keypoints": kps,
                "scores": [],
            }
        ],
        "categories": [{"id": 1, "name": "person", "keypoints": kp_names}],
    }
    path = tmp_path / "seq1.json"
    with open(path, "w") as f:
        json.dump(data, f)
    return str(path)


def test_coco_style_gt_loads_as_annolist(tmp_path):
    path = _coco_style_gt(tmp_path)
    frames = load_annolist_file(path)
    assert len(frames) == 1
    rect = frames[0]["annorect"][0]
    assert rect["track_id"] == [0]
    assert rect["x1"] == [4.0] and rect["x2"] == [24.0]
    pts = rect["annopoints"][0]["point"]
    ids = sorted(p["id"][0] for p in pts)
    assert ids == sorted(
        [JOINT_NAMES.index(n) for n in JOINT_NAMES]
    )  # all 15 slots (ears dropped, head_bottom -> neck)
    neck = [p for p in pts if p["id"][0] == JOINT_NAMES.index("neck")][0]
    assert neck["x"] == [15.0]  # slot 1 (head_bottom) coords


def test_load_data_dir_coco_gt_with_annolist_pred(tmp_path):
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    _coco_style_gt(gt_dir)
    # prediction: annolist format mirroring the GT joints
    frames = load_annolist_file(str(gt_dir / "seq1.json"))
    pred = []
    for fr in frames:
        rects = []
        for r in fr["annorect"]:
            pts = [
                {**p, "score": [0.9]} for p in r["annopoints"][0]["point"]
            ]
            rects.append(
                {"track_id": r.get("track_id", [0]),
                 "annopoints": [{"point": pts}]}
            )
        pred.append({"image": fr["image"], "annorect": rects})
    with open(pred_dir / "seq1.json", "w") as f:
        json.dump({"annolist": pred}, f)

    gt, pr = load_data_dir(str(gt_dir), str(pred_dir))
    from fami_pose_tpu.evaluation.ap import evaluate_ap

    ap, _, _ = evaluate_ap(gt, pr)
    np.testing.assert_allclose(ap[-1, 0], 100.0)


def test_cli_help_and_registration():
    out = subprocess.run(
        [sys.executable, osp.join(REPO, "tools", "run.py"), "--help"],
        capture_output=True, text=True, timeout=240,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
    )
    assert out.returncode == 0
    for flag in ("--cfg", "--train", "--val", "--test", "--val_from_checkpoint"):
        assert flag in out.stdout
