"""Device mesh + sharding rules: the framework's distributed backbone.

The reference has no distributed backend at all — single-process
``torch.nn.DataParallel`` only (``engine/defaults/trainer.py:57-58``; SURVEY
§2.6). The TPU-native replacement is this module: a ``jax.sharding.Mesh``
over all chips (ICI) with a primary ``data`` axis, batch arrays sharded on
it, parameters/optimizer state replicated. All collectives (gradient psum,
cross-chip batch-norm reductions) are emitted by XLA from these sharding
annotations inside the jitted train step — there is no hand-written NCCL/MPI
analog, by design.

For multi-host (multi-slice) runs, call ``maybe_initialize_distributed()``
first; ``build_mesh`` then spans all processes' devices and DCN-crossing
collectives are laid out by XLA automatically. Data feeding is
process-sharded end to end: each process's ``DataLoader`` loads only its
contiguous slice of every global batch (``data/loader.py``), and
``shard_batch`` assembles the global array from the process-local shards via
``jax.make_array_from_process_local_data``. Checkpoint writes are guarded to
process 0 (``engine/checkpoints.py``). The 2-process CPU test
(``tests/test_multihost.py``) proves a sharded train step + checkpoint
round-trip across real process boundaries.

A ``model`` axis is reserved in the mesh for tensor-parallel extensions; at
~64M params FAMI-Pose needs none, so its size defaults to 1 (SURVEY §2.6).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed(cfg=None) -> None:
    """Multi-process (multi-slice) init; no-op when single-process."""
    try:
        if jax.process_count() > 1:
            return  # already initialized
    except RuntimeError:
        pass
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def build_mesh(
    devices: Optional[Sequence] = None,
    mesh_shape: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Construct the mesh. ``mesh_shape`` entries of -1 absorb all remaining
    devices (like ``cfg.TPU.MESH_SHAPE = [-1]``)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if mesh_shape is None:
        mesh_shape = [-1] + [1] * (len(axis_names) - 1)
    shape = list(int(s) for s in mesh_shape)
    if len(shape) < len(axis_names):
        shape = shape + [1] * (len(axis_names) - len(shape))
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    need = int(np.prod(shape))
    if need > n:
        raise ValueError(f"mesh shape {shape} needs {need} devices, have {n}")
    dev_array = np.asarray(devices[:need]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names[: dev_array.ndim]))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place a pytree of host arrays with the batch axis sharded on ``data``.

    Single-process: a plain sharded ``device_put`` of the full host batch.
    Multi-process: each leaf is this process's CONTIGUOUS slice of the
    global batch (rows ``[p*local, (p+1)*local)`` — the loader's layout);
    ``jax.make_array_from_process_local_data`` assembles the global array
    without any cross-host data movement (``jax.devices()`` orders devices
    process-major, so the ``data``-axis shards line up with the slices).
    """
    sh = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)
            ),
            batch,
        )
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_batch_slice(global_batch_size: int) -> slice:
    """The contiguous rows of a global batch owned by this process."""
    pc = jax.process_count()
    if global_batch_size % pc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{pc} processes"
        )
    local = global_batch_size // pc
    p = jax.process_index()
    return slice(p * local, (p + 1) * local)


def pad_to_multiple(n: int, k: int) -> int:
    return ((n + k - 1) // k) * k
