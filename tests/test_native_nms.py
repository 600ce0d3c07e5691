"""Native C++ NMS vs the pure-numpy golden implementations."""

import numpy as np
import pytest

from fami_pose_tpu.native import (
    cpu_nms,
    is_available,
    oks_nms_native,
    soft_oks_nms_native,
)
from fami_pose_tpu.ops.nms import nms as np_nms, oks_nms as np_oks


def _random_dets(rng, n=40):
    x1 = rng.uniform(0, 200, n)
    y1 = rng.uniform(0, 200, n)
    w = rng.uniform(10, 80, n)
    h = rng.uniform(10, 80, n)
    scores = rng.rand(n)
    return np.stack([x1, y1, x1 + w, y1 + h, scores], -1).astype(np.float32)


def _random_kpts_db(rng, n=25, nj=17):
    db = []
    for _ in range(n):
        base = rng.uniform(50, 400, 2)
        kp = np.zeros((nj, 3), np.float32)
        kp[:, :2] = base + rng.uniform(-40, 40, (nj, 2))
        kp[:, 2] = rng.rand(nj)
        db.append(
            {"keypoints": kp, "score": float(rng.rand()), "area": float(rng.uniform(1e3, 1e4))}
        )
    return db


def test_native_builds():
    assert is_available(), "g++ toolchain present; native build must succeed"


@pytest.mark.parametrize("thresh", [0.3, 0.5, 0.7])
def test_cpu_nms_matches_numpy(rng, thresh):
    dets = _random_dets(rng)
    assert cpu_nms(dets, thresh) == list(np_nms(dets, thresh))


@pytest.mark.parametrize("thresh", [0.3, 0.6, 0.9])
def test_oks_nms_matches_numpy(rng, thresh):
    db = _random_kpts_db(rng)
    got = oks_nms_native(db, thresh)
    ref = list(np_oks(db, thresh))
    assert got == ref


def test_oks_nms_with_visibility_threshold(rng):
    db = _random_kpts_db(rng)
    got = oks_nms_native(db, 0.5, in_vis_thre=0.5)
    ref = list(np_oks(db, 0.5, vis_thr=0.5))
    assert got == ref


def test_soft_oks_nms_keep_matches_numpy(rng):
    from fami_pose_tpu.ops.nms import soft_oks_nms as np_soft

    db = _random_kpts_db(rng, n=15)
    thresh = 0.4
    keep, scores = soft_oks_nms_native(
        db, thresh, method=2, soft_sigma=thresh, max_dets=20
    )
    ref = list(np_soft(db, thresh, max_dets=20))
    assert keep == ref
    assert len(scores) == len(keep)
    # rescored scores are non-increasing (picked max-first)
    assert all(scores[i] >= scores[i + 1] - 1e-6 for i in range(len(scores) - 1))


def test_empty_inputs():
    assert cpu_nms(np.zeros((0, 5), np.float32), 0.5) == []
    assert oks_nms_native([], 0.5) == []
    assert soft_oks_nms_native([], 0.5) == ([], [])
