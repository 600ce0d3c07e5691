"""Sustained-training evidence (VERDICT r2 #5): ~80 consecutive train steps
on the synthetic fixture with a mid-run kill/resume at a checkpoint boundary.

What unit tests miss and this catches: state threading across epochs, BN
running-stat drift, per-step LR schedule continuity across resume, and
whether the optimization actually converges (PCK rises, loss falls) rather
than merely executing.
"""

import json
import os.path as osp
import sys

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, osp.dirname(__file__))
from fixtures import make_cfg, make_posetrack_fixture  # noqa: E402


def _cfg(root, img_dir):
    from fami_pose_tpu.models.hrnet import TINY_EXTRA

    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = TINY_EXTRA
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.DCN_OFFSET_GROUPS = 4
    cfg.TPU.DCN_MAX_OFFSET = 2
    cfg.TPU.USE_PALLAS_DCN = False  # interpret-mode Pallas is slow on CPU
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.BEGIN_EPOCH = 0
    cfg.TRAIN.AUTO_RESUME = True
    cfg.TRAIN.SHUFFLE = True
    cfg.TRAIN.LR = 1e-3
    # overfit a FIXED sample set: augmentation off, else the random
    # scale/rot/flip re-draws targets every epoch and the loss plateaus
    cfg.TRAIN.SCALE_FACTOR = [0.0, 0.0]
    cfg.TRAIN.ROT_FACTOR = 0
    cfg.TRAIN.FLIP = False
    cfg.DATASET.RANDOM_AUX_FRAME = False
    # keep the schedule flat across the run so the loss curve is about
    # optimization, not LR decay; resume continuity is still exercised
    cfg.TRAIN.LR_STEP = [1000]
    cfg.PRINT_FREQ = 1
    cfg.OUTPUT_DIR = osp.join(root, "out")
    return cfg


def test_sustained_training_with_midrun_resume(tmp_path):
    from fami_pose_tpu.engine.trainer import Trainer

    root = str(tmp_path)
    # draw_joints: keypoints are visibly marked, so the pose mapping is
    # learnable from local features — the run must CONVERGE, not merely
    # execute (pure-noise images would require slow memorization)
    _, img_dir = make_posetrack_fixture(
        root, n_videos=2, n_frames=5, people_per_frame=2, seed=3,
        draw_joints=True,
    )
    dirs = {
        "checkpoints": osp.join(root, "ckpt"),
        "log": osp.join(root, "log"),
    }

    # phase 1: epochs [0, 20)
    cfg1 = _cfg(root, img_dir)
    cfg1.TRAIN.END_EPOCH = 20
    t1 = Trainer(cfg1, output_dirs=dirs)
    steps_per_epoch = t1.steps_per_epoch
    assert steps_per_epoch >= 2
    state1 = t1.train()
    t1.writer.close()
    leaves1 = jax.tree.leaves(
        {"params": state1.params, "batch_stats": state1.batch_stats,
         "opt": state1.opt_state}
    )
    step1 = int(state1.step)
    assert step1 == 20 * steps_per_epoch

    # phase 2: simulated preemption — a fresh Trainer must resume from the
    # epoch-19 checkpoint with BITWISE state continuity (params, BN stats,
    # optimizer moments, step counter)
    cfg2 = _cfg(root, img_dir)
    cfg2.TRAIN.END_EPOCH = 40
    t2 = Trainer(cfg2, output_dirs=dirs)
    assert t2.begin_epoch == 20
    leaves2 = jax.tree.leaves(
        {"params": t2.state.params, "batch_stats": t2.state.batch_stats,
         "opt": t2.state.opt_state}
    )
    assert int(t2.state.step) == step1
    assert len(leaves1) == len(leaves2)
    for a, b in zip(leaves1, leaves2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    t2.train()
    t2.writer.close()

    # the metrics stream covers the whole run and shows real optimization:
    # loss at the end well below the start, PCK meter high on the overfit set
    recs = [
        json.loads(line)
        for line in open(osp.join(dirs["log"], "metrics.jsonl"))
    ]
    loss = [(r["step"], r["value"]) for r in recs if r["tag"] == "train_loss"]
    acc = [(r["step"], r["value"]) for r in recs if r["tag"] == "train_acc"]
    assert loss and acc
    steps = [s for s, _ in loss]
    assert max(steps) >= 39 * steps_per_epoch  # logs reach the final epoch
    # regression thresholds calibrated against measured TINY-on-CPU
    # convergence (loss ratio ~0.6 and PCK ~0.15 at 80 steps on the marked
    # fixture); the PCK>0.9 overfit evidence lives in the W48 on-chip run
    # (docs/SUSTAINED_TRAIN_W48.md) — TINY's 8-channel trunk is too small
    # to reach it in test-budget steps
    first5 = np.mean([v for _, v in loss[:5]])
    last5 = np.mean([v for _, v in loss[-5:]])
    assert last5 < 0.8 * first5, (first5, last5)
    first_acc = np.mean([v for _, v in acc[:5]])
    last_acc = np.mean([v for _, v in acc[-5:]])
    assert last_acc > 0.08 and last_acc > 2 * first_acc, (first_acc, last_acc)
    # the stream is continuous across the resume boundary (no step gap
    # larger than one epoch of PRINT_FREQ-spaced logs)
    gaps = np.diff(sorted(set(steps)))
    assert gaps.max() <= steps_per_epoch
