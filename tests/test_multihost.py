"""Multi-host data feeding: 2-process CPU distributed test (VERDICT r3 #2).

The reference never had multi-process data loading
(``datasets/zoo/build.py:30`` "TODO Change to dataloader distributed in the
future"); BASELINE config 5 (data-parallel PoseTrack18 on v5e-16) spans
hosts, so the TPU framework must feed each process only its shard and form
global arrays. These tests prove it two ways:

* unit: the DataLoader's process slicing partitions every global batch
  (identical order across processes, disjoint contiguous local slices,
  correct global meta), no distributed runtime needed;
* integration: two REAL processes over ``jax.distributed.initialize`` run
  a sharded train step (global 8-device mesh, 4 virtual CPU devices per
  process), checkpoint from process 0 only, resume bitwise, agree on the
  final state digest, and run the mesh-sharded eval loop end to end
  (``tests/multihost_worker.py``).
"""

import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_cfg, make_posetrack_fixture

from fami_pose_tpu.data.loader import DataLoader
from fami_pose_tpu.utils.registry import DATASET_REGISTRY, TRAIN_PHASE, VAL_PHASE

HERE = osp.dirname(osp.abspath(__file__))


def _dataset(tmp_path, phase):
    _, img_dir = make_posetrack_fixture(str(tmp_path), n_videos=2, n_frames=5,
                                        people_per_frame=2, seed=0)
    cfg = make_cfg(osp.join(str(tmp_path), "json"), img_dir)
    cfg.TRAIN.SCALE_FACTOR = [0.0, 0.0]
    cfg.TRAIN.ROT_FACTOR = 0
    cfg.TRAIN.FLIP = False
    cfg.DATASET.RANDOM_AUX_FRAME = False
    return DATASET_REGISTRY.get(cfg.DATASET.NAME)(cfg, phase)


def test_process_sharded_loader_partitions_batches(tmp_path):
    ds = _dataset(tmp_path, TRAIN_PHASE)
    global_bs = 8
    loaders = [
        DataLoader(ds, batch_size=global_bs, shuffle=True, num_workers=1,
                   drop_last=True, seed=7, process_index=p, process_count=2)
        for p in range(2)
    ]
    full = DataLoader(ds, batch_size=global_bs, shuffle=True, num_workers=1,
                      drop_last=True, seed=7, process_index=0,
                      process_count=1)
    for b0, b1, bf in zip(iter(loaders[0]), iter(loaders[1]), iter(full)):
        assert b0["kf"].shape[0] == 4 and b1["kf"].shape[0] == 4
        # contiguous slices of the identical global order
        np.testing.assert_array_equal(b0["center"], bf["center"][:4])
        np.testing.assert_array_equal(b1["center"], bf["center"][4:])
        np.testing.assert_array_equal(b0["kf"], bf["kf"][:4])
        np.testing.assert_array_equal(b1["kf"], bf["kf"][4:])
        # global meta covers all 8 rows identically on both processes
        for b in (b0, b1):
            assert b["global_meta"]["center"].shape == (8, 2)
            assert len(b["global_meta"]["image_path"]) == 8
        np.testing.assert_array_equal(
            b0["global_meta"]["center"], b1["global_meta"]["center"]
        )


def test_process_sharded_loader_eval_meta_matches_samples(tmp_path):
    """Eval phase: index-derived global meta must equal the per-sample meta
    the single-process loader emits (no augmentation in eval)."""
    ds = _dataset(tmp_path, VAL_PHASE)
    sharded = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1,
                         drop_last=False, process_index=0, process_count=2)
    full = DataLoader(ds, batch_size=8, shuffle=False, num_workers=1,
                      drop_last=False, process_index=0, process_count=1)
    for bs, bf in zip(iter(sharded), iter(full)):
        valid = int(bf["valid"])
        meta = bs["global_meta"]
        np.testing.assert_allclose(
            meta["center"][:valid], bf["center"][:valid], rtol=1e-6
        )
        np.testing.assert_allclose(
            meta["scale"][:valid], bf["scale"][:valid], rtol=1e-6
        )
        np.testing.assert_allclose(
            meta["score"][:valid], bf["score"][:valid], rtol=1e-6
        )
        assert meta["image_path"][:valid] == list(bf["image_path"][:valid])
        assert bs["valid"] == bf["valid"]


def test_indivisible_global_batch_rejected(tmp_path):
    ds = _dataset(tmp_path, TRAIN_PHASE)
    with pytest.raises(ValueError, match="not divisible"):
        DataLoader(ds, batch_size=9, process_index=0, process_count=2)


@pytest.mark.slow
def test_two_process_train_checkpoint_eval(tmp_path):
    """The real thing: 2 OS processes, global mesh, sharded train step,
    process-0 checkpointing, bitwise resume, identical final state."""
    from test_end_to_end import _write_gt_annolists

    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=2, n_frames=5,
                                        people_per_frame=2, seed=0)
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    gt_dir = _write_gt_annolists(root, img_dir, cfg)
    assert gt_dir == osp.join(root, "gt_annolist")

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, osp.join(HERE, "multihost_worker.py"),
             str(p), str(port), root],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for p in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
        assert "WORKER_OK" in out
    digests = {}
    quant_digests = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("DIGEST "):
                _, wpid, d = line.split()
                digests[wpid] = d
            elif line.startswith("QUANT_DIGEST "):
                _, wpid, d = line.split()
                quant_digests[wpid] = d
    assert set(digests) == {"0", "1"}
    assert digests["0"] == digests["1"], "final states diverged across hosts"
    # int8 PTQ: process 0's calibration scales are broadcast, so the
    # replicated quant collection must be bitwise identical on both hosts
    assert set(quant_digests) == {"0", "1"}
    assert quant_digests["0"] == quant_digests["1"], (
        "quant scales diverged across hosts"
    )
