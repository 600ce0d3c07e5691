"""Round-trip tests for the PT17<->PT18 poseval format converter
(reference ``poseval/py/convert.py`` + ``posetrack18_id2fname.py``)."""

import json

import pytest

from fami_pose_tpu.evaluation.convert import (
    PT18_NAMES_COCO_ORDER,
    PT_CANONICAL_NAMES,
    convert_dir,
    convert_videos,
    posetrack18_fname2id,
    posetrack18_id2fname,
    register_sequence,
)


def _annolist_fixture():
    """Two frames of sequence 000043_mpii_train; frame 0 has one person."""
    point = lambda pid, x, y, s: {
        "id": [pid], "x": [x], "y": [y], "score": [s], "is_visible": [1]
    }
    person = {
        "track_id": [7],
        "x1": [10.0], "x2": [30.0], "y1": [5.0], "y2": [25.0],
        "score": [0.9],
        "annopoints": [{"point": [
            point(0, 100.0, 200.0, 0.5),   # right_ankle
            point(13, 110.0, 120.0, 0.8),  # nose
            point(14, 112.0, 100.0, 0.7),  # head_top
        ]}],
    }
    return {"annolist": [
        {
            "image": [{"name": "images/val/000043_mpii_train/000000.jpg"}],
            "annorect": [person],
            "ignore_regions": [
                {"point": [{"x": [1], "y": [2]}, {"x": [3], "y": [4]},
                           {"x": [5], "y": [6]}]}
            ],
        },
        {
            "image": [{"name": "images/val/000043_mpii_train/000001.jpg"}],
            "annorect": [],
        },
    ]}


def test_fname_id_codec_roundtrip():
    fid = posetrack18_fname2id("000043_mpii_train", 17)
    assert fid == 1 * 10**10 + 43 * 10**4 + 17
    name, frame = posetrack18_id2fname(fid)
    assert name == "000043_mpii_train" and frame == 17
    # test-suffix sequences keep their suffix once registered
    register_sequence("012834_bonn_test")
    name, frame = posetrack18_id2fname(2 * 10**10 + 12834 * 10**4 + 3)
    assert name == "012834_bonn_test" and frame == 3


def test_old_to_new_structure():
    (new,) = convert_videos(_annolist_fixture())
    assert len(new["images"]) == 2
    assert len(new["annotations"]) == 1
    cat = new["categories"][0]
    assert cat["keypoints"] == PT18_NAMES_COCO_ORDER and cat["id"] == 1

    img0 = new["images"][0]
    fid = posetrack18_fname2id("000043_mpii_train", 0)
    assert img0["id"] == fid and img0["frame_id"] == fid
    assert img0["vid_id"] == "000043" and img0["nframes"] == 2
    assert img0["is_labeled"] is True and new["images"][1]["is_labeled"] is False
    assert img0["ignore_regions_x"] == [[1, 3, 5]]
    assert img0["ignore_regions_y"] == [[2, 4, 6]]

    ann = new["annotations"][0]
    assert ann["image_id"] == fid and ann["id"] == fid * 100
    assert ann["track_id"] == 7 and ann["category_id"] == 1
    # COCO order: nose first, ears zeroed
    kps = ann["keypoints"]
    assert kps[0:3] == [110.0, 120.0, 1]          # nose
    assert kps[6:9] == [112.0, 100.0, 1]          # head_top
    assert kps[9:15] == [0, 0, 0, 0, 0, 0]         # ears zeroed
    coco_ra = PT18_NAMES_COCO_ORDER.index("right_ankle")
    assert kps[3 * coco_ra : 3 * coco_ra + 2] == [100.0, 200.0]
    assert ann["scores"][0] == 0.8 and ann["scores"][coco_ra] == 0.5
    # head bbox is xywh of the annolist head rect
    assert ann["bbox_head"] == [10.0, 5.0, 20.0, 20.0]
    # person bbox: landmark extent scaled 1.3x about the center
    xs, ys = [100.0, 110.0, 112.0], [200.0, 120.0, 100.0]
    cx, ex = (max(xs) + min(xs)) / 2, max(xs) - min(xs)
    assert ann["bbox"][0] == pytest.approx(cx - 0.65 * ex)
    assert ann["bbox"][2] == pytest.approx(1.3 * ex)


def test_roundtrip_old_new_old():
    old = _annolist_fixture()
    (new,) = convert_videos(old)
    (back,) = convert_videos(new)

    assert len(back["annolist"]) == 2
    f0, f1 = back["annolist"]
    assert f0["image"][0]["name"] == old["annolist"][0]["image"][0]["name"]
    assert f0["imgnum"] == [1] and f1["imgnum"] == [2]
    assert f0["is_labeled"] == [1] and f1["is_labeled"] == [0]
    assert f0["ignore_regions"] == old["annolist"][0]["ignore_regions"]

    p = f0["annorect"][0]
    assert p["track_id"] == [7]
    # person-level score is dropped old->new (reference to_new omits it,
    # convert.py:253-259), so it cannot round-trip
    assert "score" not in p
    assert [p[k] for k in ("x1", "y1", "x2", "y2")] == [[10.0], [5.0], [30.0], [25.0]]
    pts = {pt["id"][0]: pt for pt in p["annopoints"][0]["point"]}
    assert set(pts) == {0, 13, 14}  # only annotated landmarks survive
    assert pts[13]["x"] == [110.0] and pts[13]["score"] == [0.8]
    assert pts[0]["y"] == [200.0]


def test_convert_dir_file_naming(tmp_path):
    src = tmp_path / "old"
    src.mkdir()
    with open(src / "000043_mpii_train.json", "w") as f:
        json.dump(_annolist_fixture(), f)
    out = tmp_path / "new"
    written = convert_dir(str(src), str(out))
    assert len(written) == 1 and written[0].endswith("000043_mpii_train.json")
    # and back
    out2 = tmp_path / "old_again"
    written2 = convert_dir(str(out), str(out2))
    assert len(written2) == 1
    with open(written2[0]) as f:
        back = json.load(f)
    assert "annolist" in back and len(back["annolist"]) == 2


def test_canonical_name_tables_consistent():
    assert len(PT_CANONICAL_NAMES) == 15
    assert len(PT18_NAMES_COCO_ORDER) == 17
    assert set(PT_CANONICAL_NAMES) | {"left_ear", "right_ear"} == set(
        PT18_NAMES_COCO_ORDER
    )
