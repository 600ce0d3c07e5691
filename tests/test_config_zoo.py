"""The shipped YAML experiment configs must merge cleanly and build models."""

import os.path as osp
import types

import pytest

import jax.numpy as jnp

from fami_pose_tpu.config import get_cfg

REPO = osp.abspath(osp.join(osp.dirname(__file__), ".."))


def _args(cfg_path):
    return types.SimpleNamespace(
        cfg=cfg_path, root_dir=REPO, opts=None, train=False, val=False,
        test=False,
    )


@pytest.mark.parametrize(
    "rel",
    [
        "configs/posetrack17/fami_pose.yaml",
        "configs/posetrack18/fami_pose.yaml",
        "configs/jhmdb/fami_pose.yaml",
    ],
)
def test_config_merges_and_builds_model(rel):
    cfg = get_cfg(_args(osp.join(REPO, rel)))
    assert cfg.MODEL.NAME == "FAMIPose"
    assert cfg.MODEL.EXTRA.STAGE4.NUM_CHANNELS[-1] == 384
    # paths absolutized
    assert osp.isabs(cfg.DATASET.JSON_DIR)

    import fami_pose_tpu.models  # registration
    from fami_pose_tpu.models import build_model

    model = build_model(cfg, "train")
    assert model.num_joints == int(cfg.MODEL.NUM_JOINTS)
    assert model.dtype == jnp.bfloat16
    assert model.use_pallas_dcn is True


def test_base_inheritance_pt18():
    cfg = get_cfg(_args(osp.join(REPO, "configs/posetrack18/fami_pose.yaml")))
    # from base_posetrack18 -> base_posetrack17 chain
    assert cfg.DATASET.IS_POSETRACK18 is True
    assert cfg.MODEL.SIGMA == 3  # inherited from the pt17 base
    assert cfg.DISTANCE == 3


def test_cli_opts_override():
    args = _args(osp.join(REPO, "configs/posetrack17/fami_pose.yaml"))
    args.opts = ["TRAIN.LR", "0.01", "DISTANCE", "2"]
    cfg = get_cfg(args)
    assert cfg.TRAIN.LR == 0.01
    assert cfg.DISTANCE == 2
