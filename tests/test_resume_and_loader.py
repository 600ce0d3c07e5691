"""Failure-recovery tests: checkpoint resume continuity + loader error
propagation (SURVEY §5 aux subsystems)."""

import os.path as osp

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.config import get_default_cfg
from fami_pose_tpu.engine import checkpoints
from fami_pose_tpu.engine.train_state import create_train_state
from fami_pose_tpu.data.loader import DataLoader
from fami_pose_tpu.models.fami_pose import FAMIPose
from fami_pose_tpu.models.hrnet import TINY_EXTRA
from fami_pose_tpu.optim import build_optimizer


def _tiny_state():
    model = FAMIPose(
        extra=TINY_EXTRA, num_joints=17, feat_channels=8, dcn_offset_groups=4
    )
    cfg = get_default_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 12))),
    )
    return state


def test_checkpoint_roundtrip_and_resume_epoch(tmp_path):
    state = _tiny_state()
    state = state.replace(step=jnp.asarray(123, jnp.int32))
    path = checkpoints.save_checkpoint(str(tmp_path), epoch=7, state=state)
    assert path.endswith("epoch_7_state.ckpt")

    fresh = _tiny_state()
    restored, begin_epoch = checkpoints.resume(path, fresh)
    assert begin_epoch == 8  # resume returns begin_epoch + 1
    assert int(restored.step) == 123
    a = state.params["agg_final_layer"]["kernel"]
    b = restored.params["agg_final_layer"]["kernel"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_async_checkpoint_completes_before_load(tmp_path):
    """VERDICT r3 weak #6: an async save must be joinable so the final
    epoch's checkpoint cannot be lost at interpreter exit; after
    ``wait_for_pending_saves`` the file is complete and loadable."""
    state = _tiny_state()
    state = state.replace(step=jnp.asarray(77, jnp.int32))
    path = checkpoints.save_checkpoint(
        str(tmp_path), epoch=3, state=state, async_save=True
    )
    checkpoints.wait_for_pending_saves()
    assert osp.exists(path) and not osp.exists(path + ".tmp")
    restored, begin_epoch = checkpoints.resume(path, _tiny_state())
    assert begin_epoch == 4 and int(restored.step) == 77
    # idempotent when nothing is pending
    checkpoints.wait_for_pending_saves()


def test_latest_and_all_checkpoints(tmp_path):
    state = _tiny_state()
    for e in (1, 3, 10):
        checkpoints.save_checkpoint(str(tmp_path), epoch=e, state=state)
    latest = checkpoints.get_latest_checkpoint(str(tmp_path))
    assert latest.endswith("epoch_10_state.ckpt")
    all_ge_3 = checkpoints.get_all_checkpoints(str(tmp_path), min_epoch=3)
    assert [p.split("epoch_")[1] for p in all_ge_3] == [
        "3_state.ckpt", "10_state.ckpt",
    ]


def test_load_variables_for_eval(tmp_path):
    state = _tiny_state()
    path = checkpoints.save_checkpoint(str(tmp_path), epoch=0, state=state)
    template = {
        "params": jax.tree.map(np.asarray, state.params),
        "batch_stats": jax.tree.map(np.asarray, state.batch_stats),
    }
    variables = checkpoints.load_variables(path, template)
    assert "params" in variables and "batch_stats" in variables
    np.testing.assert_allclose(
        np.asarray(variables["params"]["agg_final_layer"]["bias"]),
        np.asarray(state.params["agg_final_layer"]["bias"]),
    )


class _BrokenDataset:
    def __len__(self):
        return 8

    def __getitem__(self, i):
        if i == 5:
            raise RuntimeError("boom at index 5")
        return {
            "kf": np.zeros((8, 8, 3), np.uint8),
            "sup": np.zeros((8, 8, 12), np.uint8),
            "joints": np.zeros((17, 2), np.float32),
            "joints_vis": np.zeros(17, np.float32),
            "center": np.zeros(2, np.float32),
            "scale": np.ones(2, np.float32),
            "rotation": np.float32(0),
            "score": np.float32(1),
            "image_path": f"img{i}.jpg",
        }


def test_loader_propagates_worker_errors():
    dl = DataLoader(_BrokenDataset(), batch_size=4, shuffle=False)
    with pytest.raises(RuntimeError, match="boom at index 5"):
        list(dl)


class _ThreadTrackingDataset:
    """Records which thread served each index (checks the pool is real)."""

    def __init__(self, n=32):
        self.n = n
        self.threads = set()

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        import threading as _t
        import time as _time

        self.threads.add(_t.get_ident())
        _time.sleep(0.002)  # give other workers a chance to interleave
        return {
            "kf": np.full((4, 4, 3), i, np.uint8),
            "sup": np.zeros((4, 4, 12), np.uint8),
            "joints": np.zeros((17, 2), np.float32),
            "joints_vis": np.zeros(17, np.float32),
            "center": np.zeros(2, np.float32),
            "scale": np.ones(2, np.float32),
            "rotation": np.float32(0),
            "score": np.float32(1),
            "image_path": f"img{i}.jpg",
        }


def test_loader_num_workers_parallel_and_order_preserving():
    """num_workers>1 must use multiple threads AND keep deterministic order
    (VERDICT r1: num_workers was stored but ignored)."""
    ds1, ds4 = _ThreadTrackingDataset(), _ThreadTrackingDataset()
    ref = [b["kf"][:, 0, 0, 0].tolist() for b in
           DataLoader(ds1, batch_size=4, shuffle=True, num_workers=1, seed=3)]
    got = [b["kf"][:, 0, 0, 0].tolist() for b in
           DataLoader(ds4, batch_size=4, shuffle=True, num_workers=4, seed=3)]
    assert got == ref
    assert len(ds4.threads) > 1, "thread pool not actually used"


def test_loader_multiworker_error_propagates():
    dl = DataLoader(_BrokenDataset(), batch_size=4, shuffle=False, num_workers=3)
    with pytest.raises(RuntimeError, match="boom at index 5"):
        list(dl)


def test_evaluator_checkpoint_sweep_listing(tmp_path):
    """--val_from_checkpoint selects all checkpoints >= the id."""
    state = _tiny_state()
    ckpt_dir = tmp_path / "checkpoints"
    for e in (0, 2, 4):
        checkpoints.save_checkpoint(str(ckpt_dir), epoch=e, state=state)

    # list_model_files is pure wiring: exercise it without a dataset by
    # constructing the evaluator lazily
    from fami_pose_tpu.engine.evaluator import Evaluator

    ev = object.__new__(Evaluator)
    ev.cfg = get_default_cfg()
    ev.phase = "validate"
    ev.checkpoints_dir = str(ckpt_dir)
    ev.from_checkpoint_id = 2
    files = Evaluator.list_model_files(ev)
    assert [f.split("epoch_")[1] for f in files] == ["2_state.ckpt", "4_state.ckpt"]

    ev.from_checkpoint_id = -1
    files = Evaluator.list_model_files(ev)
    assert len(files) == 1 and files[0].endswith("epoch_4_state.ckpt")

    ev.cfg.VAL.MODEL_FILE = "/explicit/model.ckpt"
    assert Evaluator.list_model_files(ev) == ["/explicit/model.ckpt"]
