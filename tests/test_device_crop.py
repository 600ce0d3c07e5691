"""On-device batched crop-warp (TPU.DEVICE_CROP) vs the host cv2 path.

SURVEY §2.5 / VERDICT round-1 missing item 6: the reference's HOT LOOP #1
(per-sample ``cv2.warpAffine``, ``PoseTrack_Alignment.py:416-423``) becomes
one jitted batched op. These tests check the two pipelines produce the same
normalized model inputs (up to cv2's uint8 rounding) and the same targets.
"""

import numpy as np
import pytest

from fami_pose_tpu.data.loader import (
    DataLoader,
    collate,
    prepare_eval_inputs,
    prepare_eval_inputs_device_crop,
    prepare_train_batch,
    prepare_train_batch_device_crop,
)
from fami_pose_tpu.data.posetrack import PoseTrackDataset

from fixtures import make_cfg, make_posetrack_fixture


@pytest.fixture(scope="module")
def fixture_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("pt_devicecrop")
    json_path, img_dir = make_posetrack_fixture(str(root))
    return str(root / "json"), img_dir


def _datasets(fixture_dirs):
    json_dir, img_dir = fixture_dirs
    cfg = make_cfg(json_dir, img_dir)
    cfg.TRAIN.SCALE_FACTOR = 0.0
    cfg.TRAIN.ROT_FACTOR = 0
    cfg.TRAIN.FLIP = False
    host_ds = PoseTrackDataset(cfg, "validate")
    cfg2 = make_cfg(json_dir, img_dir)
    cfg2.TPU.DEVICE_CROP = True
    cfg2.TPU.DEVICE_CROP_CANVAS = [192, 192]
    dev_ds = PoseTrackDataset(cfg2, "validate")
    return cfg, host_ds, dev_ds


def test_sample_shapes_and_meta(fixture_dirs):
    _, host_ds, dev_ds = _datasets(fixture_dirs)
    h = host_ds[0]
    d = dev_ds[0]
    assert d["kf"].shape == (192, 192, 3) and d["kf"].dtype == np.uint8
    assert d["sup"].shape[-1] == h["sup"].shape[-1]
    assert "crop_center" in d and "crop_center" not in h
    # meta center/scale (used by the eval decode) must stay in ORIGINAL
    # image coordinates in both modes
    np.testing.assert_allclose(d["center"], h["center"])
    np.testing.assert_allclose(d["scale"], h["scale"])
    np.testing.assert_allclose(d["joints"], h["joints"])


def test_device_crop_matches_host_crop(fixture_dirs):
    cfg, host_ds, dev_ds = _datasets(fixture_dirs)
    image_size = (int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1]))
    heatmap_size = (int(cfg.MODEL.HEATMAP_SIZE[0]), int(cfg.MODEL.HEATMAP_SIZE[1]))

    hb = collate([host_ds[i] for i in range(4)])
    db = collate([dev_ds[i] for i in range(4)])

    host_out = prepare_train_batch(
        hb["kf"], hb["sup"], hb["joints"], hb["joints_vis"],
        sigma=2, image_size=image_size, heatmap_size=heatmap_size,
    )
    dev_out = prepare_train_batch_device_crop(
        db["kf"], db["sup"], db["crop_center"], db["scale"], db["rotation"],
        db["joints"], db["joints_vis"],
        sigma=2, image_size=image_size, heatmap_size=heatmap_size,
    )
    # cv2 warps uint8 (rounds per pixel); device path warps float.
    # 1/255 of rounding -> ~0.02 after ImageNet normalization.
    for k in ("kf", "sup"):
        diff = np.abs(np.asarray(host_out[k]) - np.asarray(dev_out[k]))
        assert diff.max() < 0.06, (k, diff.max())
    np.testing.assert_allclose(
        np.asarray(host_out["target"]), np.asarray(dev_out["target"]),
        atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(host_out["target_weight"]),
        np.asarray(dev_out["target_weight"]),
    )

    # eval prep agrees too
    kf_h, sup_h = prepare_eval_inputs(hb["kf"], hb["sup"])
    kf_d, sup_d = prepare_eval_inputs_device_crop(
        db["kf"], db["sup"], db["crop_center"], db["scale"], db["rotation"],
        image_size=image_size,
    )
    assert np.abs(np.asarray(kf_h) - np.asarray(kf_d)).max() < 0.06
    assert np.abs(np.asarray(sup_h) - np.asarray(sup_d)).max() < 0.06


def test_loader_carries_crop_center(fixture_dirs):
    _, _, dev_ds = _datasets(fixture_dirs)
    loader = DataLoader(dev_ds, batch_size=3, num_workers=2)
    batch = next(iter(loader))
    assert batch["crop_center"].shape == (3, 2)
    assert batch["kf"].shape[1:] == (192, 192, 3)
