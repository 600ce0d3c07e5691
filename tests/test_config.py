import os

import pytest

from fami_pose_tpu.config import get_cfg, get_default_cfg, update_config
from fami_pose_tpu.config.node import CfgNode


def test_default_tree_keys():
    cfg = get_default_cfg()
    assert cfg.MODEL.NUM_JOINTS == 17
    assert cfg.MODEL.IMAGE_SIZE == [256, 256]
    assert cfg.LOSS.HEATMAP_MSE.USE is True
    assert cfg.TRAIN.OPTIMIZER == "adam"
    assert cfg.VAL.USE_GT_BBOX is False
    assert cfg.DISTANCE == 2
    assert cfg.TPU.MESH_AXES == ["data"]


def test_merge_from_list_type_coercion():
    cfg = get_default_cfg()
    cfg.merge_from_list(["TRAIN.LR", "0.01", "MODEL.NUM_JOINTS", "15", "TRAIN.FLIP", "False"])
    assert cfg.TRAIN.LR == 0.01
    assert cfg.MODEL.NUM_JOINTS == 15
    assert cfg.TRAIN.FLIP is False


def test_merge_rejects_unknown_key():
    cfg = get_default_cfg()
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NO.SUCH.KEY", 1])


def test_extra_allows_new_keys():
    cfg = get_default_cfg()
    other = CfgNode._from_plain({"MODEL": {"EXTRA": {"STAGE2": {"NUM_MODULES": 1}}}})
    cfg.merge_from_other_cfg(other)
    assert cfg.MODEL.EXTRA.STAGE2.NUM_MODULES == 1


def test_freeze():
    cfg = get_default_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.LR = 1.0
    cfg.defrost()
    cfg.TRAIN.LR = 1.0


def test_base_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("MODEL:\n  SIGMA: 3\n  IMAGE_SIZE: [288, 384]\nDISTANCE: 3\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"_BASE_: base.yaml\nMODEL:\n  SIGMA: 2\n")
    cfg = get_default_cfg()
    cfg.merge_from_file(str(child))
    assert cfg.MODEL.SIGMA == 2          # child wins
    assert cfg.MODEL.IMAGE_SIZE == [288, 384]  # inherited
    assert cfg.DISTANCE == 3


def test_update_config_absolutizes_paths(tmp_path):
    class Args:
        cfg = None
        opts = ["OUTPUT_DIR", "out/exp1"]
        root_dir = str(tmp_path)

    cfg = get_cfg(Args())
    assert os.path.isabs(cfg.OUTPUT_DIR)
    assert cfg.OUTPUT_DIR == os.path.join(str(tmp_path), "out/exp1")


def test_clone_independent():
    cfg = get_default_cfg()
    cfg.freeze()
    c2 = cfg.clone()
    c2.TRAIN.LR = 42.0  # clone is defrosted
    assert cfg.TRAIN.LR != 42.0


def test_use_mppe_config_warns(caplog):
    """--use_mppe_config is a documented no-op: one unified default tree
    subsumes the reference's two trees (config/config.py:50-53); the flag
    must say so rather than silently changing nothing."""
    import logging

    class Args:
        cfg = None
        opts = None
        root_dir = "."
        use_mppe_config = True

    with caplog.at_level(logging.WARNING, logger="fami_pose_tpu.config"):
        get_cfg(Args())
    assert any("use_mppe_config" in r.message for r in caplog.records)

    caplog.clear()
    Args.use_mppe_config = False
    with caplog.at_level(logging.WARNING, logger="fami_pose_tpu.config"):
        get_cfg(Args())
    assert not any("use_mppe_config" in r.message for r in caplog.records)
