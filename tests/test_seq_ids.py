"""PoseTrack18 id<->fname converters: round-trip + differential vs reference."""

import importlib.util
import os

import pytest

from fami_pose_tpu.evaluation.seq_ids import (
    _tables,
    idx2seqtype,
    posetrack18_fname2id,
    posetrack18_id2fname,
    seqtype2idx,
)

REF_FILE = (
    "/root/reference/datasets/zoo/posetrack/posetrack_utils/poseval/py/"
    "posetrack18_id2fname.py"
)


def test_roundtrip_all_known_sequences():
    t = _tables()
    seen = 0
    for split_key in ("pt17_train", "pt17_testval", "pt18_train", "pt18_testval"):
        for source_idx, seq_idx in sorted(t[split_key]):
            image_id = source_idx * 10_000_000_000 + seq_idx * 10_000 + 42
            fname, frame = posetrack18_id2fname(image_id)
            assert frame == 42
            assert fname.startswith(f"{seq_idx:06d}_{idx2seqtype(source_idx)}")
            assert posetrack18_fname2id(fname, frame) == image_id
            seen += 1
    assert seen == 292 + 250 + 728 + 301


def test_seqtype_mapping_and_errors():
    for name in ("mpii", "bonn", "mpiinew"):
        assert idx2seqtype(seqtype2idx(name)) == name
    with pytest.raises(ValueError):
        seqtype2idx("nope")
    with pytest.raises(ValueError):
        idx2seqtype(7)
    with pytest.raises(ValueError):
        posetrack18_fname2id("000001_mpii_train", 10_000)
    with pytest.raises(ValueError):
        posetrack18_id2fname(1 * 10_000_000_000 + 999_999 * 10_000)


@pytest.mark.skipif(not os.path.isfile(REF_FILE), reason="reference absent")
def test_differential_vs_reference():
    spec = importlib.util.spec_from_file_location("ref_seq_ids", REF_FILE)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    t = _tables()
    for split_key in t:
        for source_idx, seq_idx in sorted(t[split_key]):
            image_id = source_idx * 10_000_000_000 + seq_idx * 10_000 + 7
            assert posetrack18_id2fname(image_id) == ref.posetrack18_id2fname(
                image_id
            )
            fname, frame = posetrack18_id2fname(image_id)
            assert posetrack18_fname2id(fname, frame) == ref.posetrack18_fname2id(
                fname, frame
            )
