"""Epoch-indexed checkpoints with auto-resume.

Same directory contract as the reference (``engine/defaults/checkpoints.py:
17-107``): ``epoch_{N}_state`` files in a checkpoints dir, latest found by
parsing the index from the filename, payload = {epoch, params, batch_stats,
opt_state}. Serialization is flax msgpack (host arrays); an optional
background thread makes saving async so the TPU never waits on disk.
"""

import atexit
import os
import os.path as osp
import re
import threading
from typing import List, Optional, Tuple

import jax
import numpy as np
from flax import serialization

CKPT_PATTERN = re.compile(r"epoch_(\d+)_state\.ckpt$")

# async writer threads not yet joined; joined at exit so the final epoch's
# checkpoint cannot be lost to interpreter teardown (daemon-thread kill)
_PENDING_SAVES: List[threading.Thread] = []
_PENDING_LOCK = threading.Lock()


def wait_for_pending_saves() -> None:
    """Block until every async ``save_checkpoint`` write has completed."""
    with _PENDING_LOCK:
        pending, _PENDING_SAVES[:] = _PENDING_SAVES[:], []
    for t in pending:
        t.join()


atexit.register(wait_for_pending_saves)


def checkpoint_path(directory: str, epoch: int) -> str:
    return osp.join(directory, f"epoch_{epoch}_state.ckpt")


def list_checkpoints(directory: str) -> List[Tuple[int, str]]:
    if not osp.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        m = CKPT_PATTERN.match(name)
        if m:
            out.append((int(m.group(1)), osp.join(directory, name)))
    return sorted(out)


def get_latest_checkpoint(directory: str) -> Optional[str]:
    ckpts = list_checkpoints(directory)
    return ckpts[-1][1] if ckpts else None


def get_all_checkpoints(directory: str, min_epoch: int = 0) -> List[str]:
    return [p for e, p in list_checkpoints(directory) if e >= min_epoch]


def save_checkpoint(
    directory: str, epoch: int, state, async_save: bool = False
) -> str:
    """Serialize {epoch, params, batch_stats, opt_state} to disk.

    Multi-host: params/opt-state are replicated across processes, so only
    process 0 writes (the reference is single-process and has no analog;
    without the guard every host would race on the same shared-filesystem
    path). Async writes are tracked and joined at exit / via
    ``wait_for_pending_saves`` so the last epoch's save cannot be lost.
    """
    path = checkpoint_path(directory, epoch)
    if jax.process_index() != 0:
        return path
    os.makedirs(directory, exist_ok=True)
    payload = {
        "begin_epoch": np.int64(epoch),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
    }

    def write():
        data = serialization.to_bytes(payload)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)

    if async_save:
        t = threading.Thread(target=write, daemon=True)
        with _PENDING_LOCK:
            _PENDING_SAVES.append(t)
        t.start()
    else:
        write()
    return path


def resume(path: str, state) -> Tuple[object, int]:
    """Restore a TrainState from ``path``; returns (state, begin_epoch + 1)
    like the reference's resume contract (``checkpoints.py:70-107``)."""
    with open(path, "rb") as f:
        data = f.read()
    template = {
        "begin_epoch": np.int64(0),
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(0, np.int32),
    }
    payload = serialization.from_bytes(template, data)
    new_state = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=payload["step"],
    )
    return new_state, int(payload["begin_epoch"]) + 1


def load_variables(path: str, variables_template: dict) -> dict:
    """Load only model variables (params + batch_stats) for evaluation
    (the evaluator has no optimizer state; ``evaluator.py:80-89`` analog)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())

    def _restore(template, got):
        if isinstance(template, dict):
            return {k: _restore(v, got[k]) for k, v in template.items()}
        return np.asarray(got)

    return {
        "params": _restore(variables_template["params"], payload["params"]),
        "batch_stats": _restore(
            variables_template.get("batch_stats", {}), payload["batch_stats"]
        ),
    }
