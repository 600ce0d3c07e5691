"""Evaluation protocol tests: synthetic scenarios + differential check
against the vendored reference poseval (run as a black-box golden)."""

import json
import os
import os.path as osp
import sys
import types

import numpy as np
import pytest

from fami_pose_tpu.evaluation.annolist_writer import (
    convert_data_to_annorect_struct,
    write_video_annolists,
)
from fami_pose_tpu.evaluation.ap import evaluate_ap, voc_ap
from fami_pose_tpu.evaluation.assign import assign_gt_multi
from fami_pose_tpu.evaluation.evaluate import evaluate, group_table
from fami_pose_tpu.evaluation.poseval_data import (
    JOINT_NAMES,
    N_JOINTS,
    load_data_dir,
)
from fami_pose_tpu.evaluation.tracking import MOTAccumulatorLite, evaluate_tracking


def _gt_rect(joints_xy, track_id=0, head=(0, 0, 20, 20)):
    """joints_xy: dict joint_id -> (x, y)."""
    pts = [
        {"id": [j], "x": [float(x)], "y": [float(y)]}
        for j, (x, y) in joints_xy.items()
    ]
    x1, y1, w, h = head
    return {
        "x1": [x1], "y1": [y1], "x2": [x1 + w], "y2": [y1 + h],
        "track_id": [track_id], "score": [1.0],
        "annopoints": [{"point": pts}],
    }


def _pr_rect(joints_xys, track_id=0):
    """joints_xys: dict joint_id -> (x, y, score)."""
    pts = [
        {"id": [j], "x": [float(x)], "y": [float(y)], "score": [float(s)]}
        for j, (x, y, s) in joints_xys.items()
    ]
    return {"track_id": [track_id], "score": [1.0], "annopoints": [{"point": pts}]}


def _frames(rects_per_frame, seq_id=0):
    return [
        {"annorect": rects, "seq_id": seq_id, "seq_name": f"seq{seq_id}"}
        for rects in rects_per_frame
    ]


def test_perfect_predictions_ap_100():
    gt_j = {j: (10 + 5 * j, 20 + 3 * j) for j in range(N_JOINTS)}
    pr_j = {j: (x, y, 0.9) for j, (x, y) in gt_j.items()}
    gt = _frames([[_gt_rect(gt_j)]] * 3)
    pr = _frames([[_pr_rect(pr_j)]] * 3)
    ap, pre, rec = evaluate_ap(gt, pr)
    np.testing.assert_allclose(ap[: N_JOINTS + 1, 0], 100.0)
    np.testing.assert_allclose(rec[: N_JOINTS, 0], 100.0)


def test_far_predictions_ap_0():
    gt_j = {j: (10, 10) for j in range(N_JOINTS)}
    pr_j = {j: (500, 500, 0.9) for j in range(N_JOINTS)}
    gt = _frames([[_gt_rect(gt_j, head=(0, 0, 10, 10))]])
    pr = _frames([[_pr_rect(pr_j)]])
    ap, _, _ = evaluate_ap(gt, pr)
    np.testing.assert_allclose(ap[:N_JOINTS, 0], 0.0)


def test_half_joints_matched():
    """Joints 0..6 exact, joints 7..14 far away -> per-joint split AP."""
    gt_j = {j: (20 * j, 10) for j in range(N_JOINTS)}
    pr_j = {}
    for j in range(N_JOINTS):
        if j < 7:
            pr_j[j] = (20 * j, 10, 0.9)
        else:
            pr_j[j] = (20 * j + 300, 10, 0.9)
    gt = _frames([[_gt_rect(gt_j, head=(0, 0, 8, 8))]])
    pr = _frames([[_pr_rect(pr_j)]])
    ap, _, _ = evaluate_ap(gt, pr)
    np.testing.assert_allclose(ap[:7, 0], 100.0)
    np.testing.assert_allclose(ap[7:N_JOINTS, 0], 0.0)


def test_voc_ap_simple():
    # one TP at high score, one FP at low score, 1 GT
    prec = np.array([1.0, 0.5])
    rec = np.array([1.0, 1.0])
    assert voc_ap(rec, prec) == pytest.approx(1.0)


def test_score_ranking_affects_ap():
    """FP scored above TP halves AP (VOC integration)."""
    gt_j = {0: (10.0, 10.0)}
    gt = _frames([[_gt_rect(gt_j, head=(0, 0, 10, 10))]])
    good = {0: (10.0, 10.0, 0.2)}
    bad = {0: (400.0, 400.0, 0.9)}
    pr = _frames([[_pr_rect(good, track_id=0), _pr_rect(bad, track_id=1)]])
    ap, _, _ = evaluate_ap(gt, pr)
    assert ap[0, 0] == pytest.approx(50.0)


# -- tracking -----------------------------------------------------------------

def test_mot_accumulator_basic():
    acc = MOTAccumulatorLite()
    # frame 1: gt [1,2], pred [1,2], both match
    acc.update([1, 2], [1, 2], np.array([[0.1, np.nan], [np.nan, 0.2]]))
    assert acc.num_matches == 2 and acc.num_misses == 0
    # frame 2: object 1 switches to hyp 2
    acc.update([1], [2], np.array([[0.1]]))
    assert acc.num_switches == 1
    # frame 3: missing object + FP
    acc.update([1], [7], np.array([[np.nan]]))
    assert acc.num_misses == 1 and acc.num_false_positives == 1
    assert acc.num_objects == 4


def test_tracking_perfect():
    gt_j = {j: (10 + 5 * j, 20) for j in range(N_JOINTS)}
    pr_j = {j: (x, y, 0.9) for j, (x, y) in gt_j.items()}
    gt = _frames([[_gt_rect(gt_j, track_id=3)]] * 4)
    pr = _frames([[_pr_rect(pr_j, track_id=8)]] * 4)
    _, _, _, mot_all = assign_gt_multi(gt, pr, 0.5)
    res = evaluate_tracking(gt, mot_all)
    np.testing.assert_allclose(res["mota"][:N_JOINTS], 100.0)


# -- writer + end-to-end ------------------------------------------------------

def _coco_pose(xy17, score=0.9):
    """(17, 2) -> the reference's 4x17 pose array (x, y, 1, score rows)."""
    arr = np.ones((4, 17))
    arr[0] = xy17[:, 0]
    arr[1] = xy17[:, 1]
    arr[3] = score
    return arr


def test_annorect_struct_and_dummy():
    xy = np.stack([np.arange(17) * 10.0, np.arange(17) * 5.0], -1)
    boxes = [np.array([[0, 0, 0, 0, 0, 0.7]])]
    rects = convert_data_to_annorect_struct([_coco_pose(xy)], [4], boxes)
    assert len(rects) == 1
    assert rects[0]["track_id"] == [4]
    assert len(rects[0]["annopoints"][0]["point"]) == 15
    # empty frame -> dummy detection
    dummy = convert_data_to_annorect_struct([], [], [])
    assert dummy[0]["annopoints"][0]["point"][0]["score"] == [-100.0]


def test_write_and_evaluate_roundtrip(tmp_path):
    """Write GT + predicted annolists for 2 videos, run the full driver."""
    rng = np.random.RandomState(3)
    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    os.makedirs(gt_dir)

    preds_by_frame = {}
    frames_by_video = {}
    for v in range(2):
        video = f"video_{v}"
        frames = [f"images/{video}/{i:08d}.jpg" for i in range(1, 4)]
        frames_by_video[video] = frames
        annolist = []
        for fp in frames:
            joints = {
                j: (40.0 * j + v * 7 + 10, 30.0 * j + 15) for j in range(12)
            }
            # neck/nose/head_top must be geometrically consistent with the
            # COCO->PT15 derivation (neck = shoulder mid, head_top = nose
            # reflected about it) for an exact roundtrip
            ls, rs = joints[9], joints[8]
            neck = ((ls[0] + rs[0]) / 2, (ls[1] + rs[1]) / 2)
            nose = (neck[0] + 11.0, neck[1] - 17.0)
            head_top = (2 * nose[0] - neck[0], 2 * nose[1] - neck[1])
            joints[12], joints[13], joints[14] = neck, nose, head_top
            annolist.append(
                {
                    "image": [{"name": fp}],
                    "annorect": [_gt_rect(joints, track_id=0, head=(0, 0, 30, 30))],
                }
            )
            # prediction = the COCO-17 pose whose PT15 conversion equals GT
            xy17 = np.zeros((17, 2))
            from fami_pose_tpu.data.keypoints import COCO_JOINTS, POSETRACK_JOINTS
            for pt_id, name in enumerate(POSETRACK_JOINTS):
                if name in COCO_JOINTS:
                    xy17[COCO_JOINTS.index(name)] = joints[pt_id]
            xy17[COCO_JOINTS.index("nose")] = nose
            preds_by_frame[fp] = {
                "poses": [_coco_pose(xy17)],
                "tracks": [0],
                "boxes": [np.array([[0, 0, 0, 0, 0, 0.9]])],
            }
        with open(gt_dir / f"{video}.json", "w") as f:
            json.dump({"annolist": annolist}, f)

    written = write_video_annolists(preds_by_frame, frames_by_video, str(pred_dir))
    assert len(written) == 2

    result = evaluate(str(gt_dir), str(pred_dir), eval_pose=True, eval_track=True)
    table = result["ap_table"]
    # neck (id 12) is NOT in the grouped table; GT neck == derived neck, so
    # every grouped joint matches exactly
    for k, v in table.items():
        assert v == pytest.approx(100.0), (k, v)
    assert result["mota_table"]["Mean"] == pytest.approx(100.0)


# -- differential vs vendored poseval ----------------------------------------

def _import_vendored_poseval():
    base = "/root/reference/datasets/zoo/posetrack/posetrack_utils/poseval"
    if not osp.isdir(base):
        pytest.skip("reference poseval not available")
    # stub shapely (only needed for ignore regions, which we don't use)
    if "shapely" not in sys.modules:
        fake = types.ModuleType("shapely")
        geom = types.ModuleType("shapely.geometry")

        class _Poly:
            def __init__(self, *a):
                pass

            def contains(self, p):
                return False

        geom.Polygon = _Poly
        geom.Point = lambda *a: None
        fake.geometry = geom
        sys.modules["shapely"] = fake
        sys.modules["shapely.geometry"] = geom
    sys.path.insert(0, base)          # for `poseval.py` package? no: py dir
    sys.path.insert(0, osp.join(base, "py-motmetrics"))
    import importlib.util

    pkg_dir = osp.join(base, "py")
    spec = importlib.util.spec_from_file_location(
        "ref_poseval", osp.join(pkg_dir, "__init__.py"),
        submodule_search_locations=[pkg_dir],
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref_poseval"] = mod
    spec.loader.exec_module(mod)
    import importlib

    helpers = importlib.import_module("ref_poseval.eval_helpers")
    ap_mod = importlib.import_module("ref_poseval.evaluateAP")
    return helpers, ap_mod


def test_differential_ap_vs_vendored():
    helpers, ap_mod = _import_vendored_poseval()
    rng = np.random.RandomState(11)

    # random multi-person scenario with noise, missing joints, extra preds
    gt_frames, pr_frames = [], []
    for f in range(6):
        gts, prs = [], []
        for person in range(3):
            base = rng.uniform(50, 400, 2)
            joints = {}
            for j in range(N_JOINTS):
                if rng.rand() < 0.15:
                    continue  # unannotated joint
                joints[j] = tuple(base + rng.uniform(-30, 30, 2))
            if not joints:
                joints = {0: tuple(base)}
            gts.append(
                _gt_rect(joints, track_id=person, head=(base[0], base[1], 25, 25))
            )
            pj = {}
            for j, (x, y) in joints.items():
                noise = rng.uniform(-15, 15, 2)
                pj[j] = (x + noise[0], y + noise[1], rng.rand())
            prs.append(_pr_rect(pj, track_id=person))
        if rng.rand() < 0.5:  # spurious detection
            prs.append(
                _pr_rect({j: (rng.uniform(0, 500), rng.uniform(0, 500), rng.rand())
                          for j in range(5)}, track_id=99)
            )
        gt_frames.append({"annorect": gts, "seq_id": 0, "seq_name": "s"})
        pr_frames.append({"annorect": prs, "seq_id": 0, "seq_name": "s"})

    import copy

    ap_ref, pre_ref, rec_ref = ap_mod.evaluateAP(
        copy.deepcopy(gt_frames), copy.deepcopy(pr_frames)
    )
    ap_mine, pre_mine, rec_mine = evaluate_ap(
        copy.deepcopy(gt_frames), copy.deepcopy(pr_frames)
    )
    np.testing.assert_allclose(ap_mine, ap_ref, atol=1e-8)
    np.testing.assert_allclose(pre_mine, pre_ref, atol=1e-8)
    np.testing.assert_allclose(rec_mine, rec_ref, atol=1e-8)


def test_mot_accumulator_matches_reference_motmetrics_golden():
    """The exact event sequence + expected values from the reference's
    vendored py-motmetrics test suite (``py-motmetrics/motmetrics/tests/
    test_mot.py::test_events``): FP-only frame, miss-only frame, match,
    forced switch, history-preference over a better new match. Expected:
    events (2 FP, 2 MISS, 4 MATCH incl. history-preferred, 2 SWITCH),
    MOTP = 11.1/6, MOTA = 1 - 6/8."""
    acc = MOTAccumulatorLite()
    acc.update([], ["a", "b"], np.zeros((0, 2)))                 # all FP
    acc.update([1, 2], [], np.zeros((2, 0)))                      # all miss
    acc.update([1, 2], ["a", "b"], np.array([[1.0, 0.5], [0.3, 1.0]]))
    acc.update([1, 2], ["a", "b"],
               np.array([[0.2, np.nan], [np.nan, 0.1]]))          # switches
    acc.update([1, 2], ["a", "b"], np.array([[5.0, 1.0], [1.0, 5.0]]))
    acc.update([], [], np.zeros((0, 0)))                          # no data

    assert acc.num_false_positives == 2
    assert acc.num_misses == 2
    assert acc.num_switches == 2
    assert acc.num_matches == 4
    assert acc.num_objects == 8
    # MOTP = sum of pairing distances / num detections = 11.1 / 6
    motp = acc.sum_d / acc.num_detections
    np.testing.assert_allclose(motp, 11.1 / 6)
    mota = 1.0 - (acc.num_misses + acc.num_false_positives +
                  acc.num_switches) / acc.num_objects
    np.testing.assert_allclose(mota, 1.0 - 6.0 / 8.0)
