"""Worker process for tests/test_multihost.py (2-process CPU distributed).

Each worker owns 4 virtual CPU devices; together they form the 8-device
global mesh. The worker drives the REAL Trainer/Evaluator through the
process-sharded data path: its DataLoader loads only the local contiguous
slice of every global batch, ``shard_batch`` assembles global arrays via
``jax.make_array_from_process_local_data``, checkpoint writes are guarded
to process 0, and the eval step all-gathers heatmaps so both hosts can
accumulate/decode. Prints ``DIGEST <pid> <sha>`` of the final train state
(the parent asserts both processes agree bitwise) and ``WORKER_OK``.

Usage: python multihost_worker.py <pid> <port> <fixture_root>
"""

import hashlib
import os
import os.path as osp
import sys

pid = int(sys.argv[1])
port = sys.argv[2]
root = sys.argv[3]

_here = osp.dirname(osp.abspath(__file__))
sys.path.insert(0, osp.join(_here, ".."))
sys.path.insert(0, _here)

flags = [
    f for f in os.environ.get("XLA_FLAGS", "").split()
    if "xla_force_host_platform_device_count" not in f
]
os.environ["XLA_FLAGS"] = " ".join(
    flags + ["--xla_force_host_platform_device_count=4"]
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4 and jax.device_count() == 8

# Create the cross-process Gloo context NOW, while both processes are in
# lockstep from the initialize() rendezvous. The context is built lazily on
# the first collective; if that first collective instead happens deep inside
# the train step, the two processes can be minutes apart on a contended
# 1-CPU host (each compiles independently) and the 30 s Gloo
# GetKeyValue/connect deadline trips — observed as
# "Gloo context initialization failed: DEADLINE_EXCEEDED".
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

_warm_mesh = Mesh(np.array(jax.devices()), ("d",))
_x = jax.device_put(
    np.arange(8, dtype=np.float32),
    NamedSharding(_warm_mesh, PartitionSpec("d")),
)
np.asarray(jax.jit(lambda a: a.sum(), out_shardings=NamedSharding(
    _warm_mesh, PartitionSpec()))(_x))  # all-reduce over all 8 devices

import numpy as np
from jax.experimental import multihost_utils

from fixtures import make_cfg

from fami_pose_tpu.engine import checkpoints
from fami_pose_tpu.engine.evaluator import Evaluator
from fami_pose_tpu.engine.trainer import Trainer
from fami_pose_tpu.models.hrnet import TINY_EXTRA


def digest(tree):
    leaves = jax.tree.leaves(tree)
    h = hashlib.sha256()
    for leaf in leaves:
        h.update(np.ascontiguousarray(np.asarray(leaf)).tobytes())
    return h.hexdigest()


cfg = make_cfg(osp.join(root, "json"), osp.join(root, "images"))
cfg.MODEL.NAME = "FAMIPose"
cfg.MODEL.EXTRA = TINY_EXTRA
cfg.TPU.COMPUTE_DTYPE = "float32"
cfg.TPU.USE_PALLAS_DCN = False  # interpret-mode Pallas is slow on CPU
cfg.TPU.DCN_OFFSET_GROUPS = 4
cfg.TPU.MESH_SHAPE = [-1]
cfg.TRAIN.BATCH_SIZE_PER_GPU = 1  # x8 chips -> global 8, local 4
cfg.TRAIN.SHUFFLE = True
cfg.TRAIN.AUTO_RESUME = True
cfg.TRAIN.SCALE_FACTOR = [0.0, 0.0]
cfg.TRAIN.ROT_FACTOR = 0
cfg.TRAIN.FLIP = False
cfg.DATASET.RANDOM_AUX_FRAME = False
cfg.VAL.BATCH_SIZE_PER_GPU = 1
cfg.VAL.USE_GT_BBOX = True
cfg.VAL.ANNOT_DIR = osp.join(root, "gt_annolist")
cfg.PRINT_FREQ = 1
cfg.OUTPUT_DIR = osp.join(root, f"out_p{pid}")
dirs = {
    "checkpoints": osp.join(root, "ckpt"),  # SHARED dir: process-0 writes
    "log": osp.join(root, f"log_p{pid}"),
}

# ---- phase 1: train 1 epoch, checkpoint -------------------------------
cfg1 = cfg.clone()
cfg1.TRAIN.END_EPOCH = 1
t1 = Trainer(cfg1, output_dirs=dirs)
assert t1.loader.process_count == 2
assert t1.loader.local_batch_size == 4
assert t1.steps_per_epoch == 2  # 20 samples, global batch 8, drop_last
state1 = t1.train()
t1.writer.close()
# save_checkpoint returns the path on every process but only 0 wrote it
multihost_utils.sync_global_devices("phase1-ckpt")
assert osp.exists(checkpoints.checkpoint_path(dirs["checkpoints"], 0))

# ---- phase 2: fresh Trainer auto-resumes bitwise, trains to epoch 2 ----
cfg2 = cfg.clone()
cfg2.TRAIN.END_EPOCH = 2
t2 = Trainer(cfg2, output_dirs=dirs)
assert t2.begin_epoch == 1, t2.begin_epoch
resume_digest = digest(
    {"p": t2.state.params, "b": t2.state.batch_stats, "o": t2.state.opt_state}
)
saved_digest = digest(
    {"p": state1.params, "b": state1.batch_stats, "o": state1.opt_state}
)
assert resume_digest == saved_digest, "resume not bitwise"
state2 = t2.train()
t2.writer.close()
final_digest = digest({"p": state2.params, "b": state2.batch_stats})
print(f"DIGEST {pid} {final_digest}", flush=True)
multihost_utils.sync_global_devices("phase2-ckpt")

# ---- eval through the process-sharded loader + replicated heatmaps -----
ev = Evaluator(cfg, output_dirs={"checkpoints": dirs["checkpoints"],
                                 "results": cfg.OUTPUT_DIR})
assert ev.loader.local_batch_size == 4
files = ev.list_model_files()
assert files, "no checkpoint found for eval"
variables = ev.load_variables(files[-1])
res = ev.eval_checkpoint(variables)
if pid == 0:
    assert "final" in res and "Mean" in dict(res["final"][0]), res
else:
    assert res == {}, "non-zero process must not score the protocol"

# ---- int8 eval: per-process PTQ calibration, process-0 scales broadcast
# (engine/evaluator._maybe_calibrate_int8) — every host must end up with a
# bitwise-identical replicated `quant` collection ----------------------
cfg8 = cfg.clone()
cfg8.TPU.INT8_EVAL = True
ev8 = Evaluator(cfg8, output_dirs={"checkpoints": dirs["checkpoints"],
                                   "results": cfg.OUTPUT_DIR})
variables8 = ev8.load_variables(files[-1])
variables8 = ev8._maybe_calibrate_int8(variables8)
assert "quant" in variables8, "int8 eval model did not calibrate"
print(f"QUANT_DIGEST {pid} {digest(variables8['quant'])}", flush=True)
res8 = ev8.eval_checkpoint(variables8)
if pid == 0:
    assert "final" in res8 and "Mean" in dict(res8["final"][0]), res8
else:
    assert res8 == {}, "non-zero process must not score the protocol"

print("WORKER_OK", flush=True)
