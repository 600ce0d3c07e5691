import numpy as np

import fami_pose_tpu.ops.nms as N
import fami_pose_tpu.ops.pose as P


def _brute_force_nms(dets, thr):
    order = np.argsort(-dets[:, 4], kind="stable")
    keep, removed = [], set()
    for i in order:
        if i in removed:
            continue
        keep.append(int(i))
        x1, y1, x2, y2 = dets[i, :4]
        a_i = (x2 - x1 + 1) * (y2 - y1 + 1)
        for j in order:
            if j == i or j in removed:
                continue
            xx1, yy1 = max(x1, dets[j, 0]), max(y1, dets[j, 1])
            xx2, yy2 = min(x2, dets[j, 2]), min(y2, dets[j, 3])
            inter = max(0, xx2 - xx1 + 1) * max(0, yy2 - yy1 + 1)
            a_j = (dets[j, 2] - dets[j, 0] + 1) * (dets[j, 3] - dets[j, 1] + 1)
            if inter / (a_i + a_j - inter) > thr:
                removed.add(int(j))
    return keep


def test_box_nms_vs_brute_force(rng):
    for _ in range(5):
        n = 30
        xy = rng.rand(n, 2) * 80
        wh = rng.rand(n, 2) * 40 + 5
        dets = np.concatenate([xy, xy + wh, rng.rand(n, 1)], axis=1)
        assert N.nms(dets, 0.4) == _brute_force_nms(dets, 0.4)


def test_box_nms_device_matches_host(rng):
    n = 25
    xy = rng.rand(n, 2) * 60
    wh = rng.rand(n, 2) * 30 + 5
    dets = np.concatenate([xy, xy + wh, rng.rand(n, 1)], axis=1).astype(np.float32)
    host = set(N.nms(dets, 0.5))
    keep = np.asarray(N.box_nms_device(dets[:, :4], dets[:, 4], np.ones(n, bool), thr=0.5))
    assert set(np.nonzero(keep)[0].tolist()) == host


def _mk_db(rng, n=12):
    db = []
    for _ in range(n):
        base = rng.rand(17, 3) * 50
        db.append({
            "score": float(rng.rand()),
            "keypoints": base,
            "area": float(rng.rand() * 1000 + 500),
        })
    # make two near-duplicates to force suppression
    db[1]["keypoints"] = db[0]["keypoints"] + 0.1
    db[1]["area"] = db[0]["area"]
    return db


def test_oks_nms_suppresses_duplicates(rng):
    db = _mk_db(rng)
    keep = N.oks_nms(db, thr=0.9)
    assert not ({0, 1} <= set(keep.tolist()))


def test_oks_nms_device_matches_host(rng):
    db = _mk_db(rng, 16)
    host = set(N.oks_nms(db, thr=0.7).tolist())
    kpts = np.stack([d["keypoints"] for d in db]).astype(np.float32)
    scores = np.array([d["score"] for d in db], np.float32)
    areas = np.array([d["area"] for d in db], np.float32)
    keep = np.asarray(N.oks_nms_device(kpts, scores, areas, np.ones(len(db), bool), thr=0.7))
    assert set(np.nonzero(keep)[0].tolist()) == host


def test_soft_oks_nms_orders_by_rescored(rng):
    db = _mk_db(rng, 8)
    keep = N.soft_oks_nms(db, thr=0.5, max_dets=5)
    assert len(keep) == 5
    assert keep[0] == int(np.argmax([d["score"] for d in db]))


def test_oks_iou_identical_poses():
    g = np.zeros(51)
    g[0::3] = np.arange(17)
    g[1::3] = np.arange(17)
    g[2::3] = 1.0
    ious = N.oks_iou(g, g[None], 100.0, np.array([100.0]))
    np.testing.assert_allclose(ious, [1.0], atol=1e-6)


def test_flip_back_involution(rng):
    hm = rng.rand(2, 17, 8, 6)
    twice = P.flip_back(P.flip_back(hm))
    np.testing.assert_allclose(twice, hm)


def test_fliplr_joints(rng):
    joints = rng.rand(17, 3) * 100
    vis = np.ones((17, 3))
    flipped, _ = P.fliplr_joints(joints.copy(), vis.copy(), width=100)
    # left_shoulder (5) should land where right_shoulder (6) was, mirrored
    assert np.isclose(flipped[5, 0], 100 - joints[6, 0] - 1)
    assert np.isclose(flipped[5, 1], joints[6, 1])


def test_half_body_returns_valid_box(rng):
    joints = rng.rand(17, 3) * 200
    vis = np.ones((17, 3))
    c, s = P.half_body_transform(joints, vis, 17, rng=rng)
    assert c is not None and s.shape == (2,)
    # aspect ratio enforced
    assert np.isclose(s[0] / s[1], 0.75, atol=1e-5) or s[0] / s[1] >= 0.75 - 1e-5
