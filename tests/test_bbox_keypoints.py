import numpy as np

from fami_pose_tpu.utils.bbox import box2cs, cs2box
from fami_pose_tpu.data import keypoints as K


def test_box2cs_roundtrip():
    box = [10.0, 20.0, 100.0, 200.0]
    aspect = 288.0 / 384.0
    center, scale = box2cs(box, aspect)
    assert np.allclose(center, [60.0, 120.0])
    # height dominates: w clamped to h * aspect
    assert np.allclose(scale * 200.0, [200.0 * aspect, 200.0])
    xywh = cs2box(center, scale)
    assert np.isclose(xywh[2], 200.0 * aspect)
    assert np.isclose(xywh[3], 200.0)


def test_box2cs_enlarge():
    _, s1 = box2cs([0, 0, 100, 100], 1.0, enlarge_factor=1.0)
    _, s2 = box2cs([0, 0, 100, 100], 1.0, enlarge_factor=1.25)
    assert np.allclose(s2, s1 * 1.25)


def test_coco2posetrack_direct_joints():
    pose = np.zeros((17, 3))
    pose[:, 0] = np.arange(17)          # x = coco index
    pose[:, 1] = np.arange(17) * 2.0    # y
    pose[:, 2] = 0.5                     # scores
    out = K.coco2posetrack_ord_infer(pose, global_score=2.0)
    assert out.shape == (15, 3)
    # right_ankle is posetrack 0, coco 16
    assert out[0, 0] == 16 and out[0, 1] == 32
    assert np.isclose(out[0, 2], 0.5 * 2.0)
    # nose is posetrack 13, coco 0
    assert out[13, 0] == 0


def test_coco2posetrack_neck_headtop():
    pose = np.zeros((17, 3))
    pose[K.COCO_JOINTS.index("right_shoulder")] = [10.0, 20.0, 0.8]
    pose[K.COCO_JOINTS.index("left_shoulder")] = [30.0, 40.0, 0.4]
    pose[K.COCO_JOINTS.index("nose")] = [18.0, 24.0, 0.9]
    out = K.coco2posetrack_ord_infer(pose)
    neck = out[K.POSETRACK_JOINTS.index("neck")]
    assert np.allclose(neck, [20.0, 30.0, 0.6])
    # head_top = nose reflected about shoulder midpoint
    head = out[K.POSETRACK_JOINTS.index("head_top")]
    assert np.allclose(head[:2], [18.0 - (20.0 - 18.0), 24.0 - (30.0 - 24.0)])
    assert np.isclose(head[2], 0.6)


def test_coco2posetrack_records_format():
    pose = np.random.RandomState(0).rand(17, 3)
    recs = K.coco2posetrack_ord_infer(pose, output_posetrack_format=True)
    assert len(recs) == 15
    assert set(recs[0].keys()) == {"id", "x", "y", "score"}
    # legacy (3,17) entrypoint agrees with the array form
    arr = K.coco2posetrack_ord_infer(pose)
    recs2 = K.coco2posetrack_ord(pose.T)
    for k in range(15):
        assert np.isclose(recs2[k]["x"][0], arr[k, 0])


def test_flip_pairs_are_mirrors():
    for a, b in K.COCO_FLIP_PAIRS:
        na, nb = K.COCO_JOINTS[a], K.COCO_JOINTS[b]
        assert na.replace("left", "right") == nb
