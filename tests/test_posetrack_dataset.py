"""PoseTrack dataset + loader tests on a synthetic fixture."""

import os.path as osp

import numpy as np
import pytest

from fami_pose_tpu.data.posetrack import (
    PoseTrackDataset,
    support_frame_deltas,
    support_frame_paths,
)
from fami_pose_tpu.data.loader import (
    DataLoader,
    build_train_loader,
    collate,
    prepare_train_batch,
)
from fami_pose_tpu.utils.registry import DATASET_REGISTRY

from fixtures import make_cfg, make_posetrack_fixture


# -- window logic (reference PoseTrack_Alignment.py:311-359) -------------------

def test_window_deltas_interior_pt17():
    # PT17: frames 1..N; frame 3 of 5, distance 3 -> prev [2,1], next [1,2]
    prev, nxt = support_frame_deltas(3, 5, 3, is_posetrack18=False)
    assert prev == [2, 1]
    assert nxt == [1, 2]


def test_window_deltas_start_boundary_pt17():
    # frame 1: no prev frames -> pads [0, 0]; frame 2: one prev
    prev, nxt = support_frame_deltas(1, 5, 3, is_posetrack18=False)
    assert prev == [0, 0]
    assert nxt == [1, 2]
    prev, nxt = support_frame_deltas(2, 5, 3, is_posetrack18=False)
    assert prev == [1, 0]
    assert nxt == [1, 2]


def test_window_deltas_end_boundary_pt17():
    # PT17 frame 5 of 5: avail_next = 5-5+1 = 1 -> no next, pads after
    prev, nxt = support_frame_deltas(5, 5, 3, is_posetrack18=False)
    assert prev == [2, 1]
    assert nxt == [0, 0]
    prev, nxt = support_frame_deltas(4, 5, 3, is_posetrack18=False)
    assert nxt == [1, 0]


def test_window_deltas_pt18_zero_based():
    # PT18 frames 0..N-1: frame 0 has no prev; frame N-1 has no next
    prev, nxt = support_frame_deltas(0, 5, 3, is_posetrack18=True)
    assert prev == [0, 0] and nxt == [1, 2]
    prev, nxt = support_frame_deltas(4, 5, 3, is_posetrack18=True)
    assert prev == [2, 1] and nxt == [0, 0]


def test_support_frame_paths_zero_fill():
    paths = support_frame_paths("/d/video/00000003.jpg", 5, 3)
    assert [p.split("/")[-1] for p in paths] == [
        "00000001.jpg", "00000002.jpg", "00000004.jpg", "00000005.jpg",
    ]
    paths18 = support_frame_paths("/d/video/000002.jpg", 5, 3)
    assert [p.split("/")[-1] for p in paths18] == [
        "000000.jpg", "000001.jpg", "000003.jpg", "000004.jpg",
    ]


# -- dataset ------------------------------------------------------------------

@pytest.fixture(scope="module")
def fixture_pt17(tmp_path_factory):
    root = tmp_path_factory.mktemp("pt17")
    json_path, img_dir = make_posetrack_fixture(str(root), posetrack18=False)
    cfg = make_cfg(str(root / "json"), img_dir, posetrack18=False)
    return cfg


def test_dataset_registered():
    assert "PoseTrack" in DATASET_REGISTRY


def test_index_and_len(fixture_pt17):
    ds = PoseTrackDataset(fixture_pt17, "train")
    # 2 videos x 5 frames x 2 people
    assert len(ds) == 20
    assert set(ds.video_image_index.keys()) == {
        "video_0000", "video_0001",
    }
    item = ds.data[0]
    for k in ("image", "center", "scale", "joints_3d", "nframes", "frame_id"):
        assert k in item


def test_getitem_shapes_train(fixture_pt17):
    ds = PoseTrackDataset(fixture_pt17, "train")
    np.random.seed(0)
    s = ds[0]
    h, w = 128, 96
    assert s["kf"].shape == (h, w, 3) and s["kf"].dtype == np.uint8
    assert s["sup"].shape == (h, w, 12)
    assert s["joints"].shape == (17, 2)
    assert s["joints_vis"].shape == (17,)
    # visible joints must land inside the crop
    vis = s["joints_vis"] > 0
    assert vis.any()
    assert (s["joints"][vis, 0] >= 0).all() and (s["joints"][vis, 0] <= w).all()


def test_getitem_eval_no_aug(fixture_pt17):
    ds = PoseTrackDataset(fixture_pt17, "validate")
    s1 = ds[3]
    s2 = ds[3]
    np.testing.assert_array_equal(s1["kf"], s2["kf"])
    assert float(s1["rotation"]) == 0.0


def test_loader_batches_and_padding(fixture_pt17):
    ds = PoseTrackDataset(fixture_pt17, "validate")
    dl = DataLoader(ds, batch_size=8, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3  # 20 -> 8+8+4(padded to 8)
    assert batches[0]["valid"] == 8
    assert batches[-1]["valid"] == 4
    assert batches[-1]["kf"].shape == (8, 128, 96, 3)


def test_prepare_train_batch(fixture_pt17):
    ds = PoseTrackDataset(fixture_pt17, "train")
    np.random.seed(1)
    batch = collate([ds[i] for i in range(4)])
    out = prepare_train_batch(
        batch["kf"], batch["sup"], batch["joints"], batch["joints_vis"],
        sigma=2, image_size=(96, 128), heatmap_size=(24, 32),
    )
    assert out["kf"].shape == (4, 128, 96, 3)
    assert out["sup"].shape == (4, 128, 96, 12)
    assert out["target"].shape == (4, 32, 24, 17)
    assert out["target_weight"].shape == (4, 17)
    # normalized inputs roughly centered
    kf = np.asarray(out["kf"])
    assert -3 < kf.mean() < 3
    # every visible joint puts a unit peak on its heatmap
    tw = np.asarray(out["target_weight"])
    tgt = np.asarray(out["target"])
    for b in range(4):
        for j in range(17):
            if tw[b, j] > 0:
                assert tgt[b, :, :, j].max() == pytest.approx(1.0, abs=1e-5)


def test_build_train_loader(fixture_pt17):
    ds = PoseTrackDataset(fixture_pt17, "train")
    cfg = fixture_pt17
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 4
    dl = build_train_loader(cfg, ds, num_devices=1)
    assert dl.batch_size == 4
    b = next(iter(dl))
    assert b["kf"].shape[0] == 4


def test_single_frame_input_type(fixture_pt17):
    cfg = fixture_pt17.clone() if hasattr(fixture_pt17, "clone") else fixture_pt17
    cfg.DATASET.INPUT_TYPE = "single_frame"
    ds = PoseTrackDataset(cfg, "validate")
    s = ds[0]
    # sup frames are key-frame copies -> identical channels
    np.testing.assert_array_equal(s["sup"][..., :3], s["kf"])
    np.testing.assert_array_equal(s["sup"][..., 3:6], s["kf"])
    cfg.DATASET.INPUT_TYPE = ""


def test_detection_box_path(tmp_path):
    """VAL.USE_GT_BBOX=False: precomputed detector boxes with IMAGE_THRE
    filtering (reference PoseTrack_Alignment.py:830-881)."""
    import json

    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1)
    dets = []
    for f in range(1, 5):
        name = f"video_0000/{f:08d}.jpg"
        dets.append({"category_id": 1, "score": 0.9,
                     "bbox": [40.0, 30.0, 60.0, 80.0], "image_name": name,
                     "nframes": 4, "frame_id": f})
        # below IMAGE_THRE -> dropped
        dets.append({"category_id": 1, "score": 0.05,
                     "bbox": [10.0, 10.0, 30.0, 40.0], "image_name": name,
                     "nframes": 4, "frame_id": f})
        # non-person -> dropped
        dets.append({"category_id": 2, "score": 0.95,
                     "bbox": [1.0, 1.0, 20.0, 20.0], "image_name": name,
                     "nframes": 4, "frame_id": f})
    det_path = osp.join(root, "dets.json")
    with open(det_path, "w") as fh:
        json.dump(dets, fh)

    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.VAL.USE_GT_BBOX = False
    cfg.VAL.COCO_BBOX_FILE = det_path
    cfg.VAL.IMAGE_THRE = 0.2
    ds = PoseTrackDataset(cfg, "validate")
    assert len(ds) == 4  # one surviving detection per frame

    s = ds[0]
    assert s["kf"].shape[-1] == 3 and s["sup"].shape[-1] == 3 * 4
    assert float(s["score"]) == pytest.approx(0.9)
    # detection entries carry dummy all-zero joints; after the crop warp the
    # out-of-crop dummies get their visibility masked — eval ignores GT
    # joints in detection mode, it only needs center/scale/score
    assert np.isfinite(s["joints"]).all()
    np.testing.assert_allclose(s["center"], [40.0 + 30.0, 30.0 + 40.0])
