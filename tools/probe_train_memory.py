"""Compile-only HBM probe for the W48 train step under remat variants.

Round 1 measured 29.5 GB unrematted (f32-staging era) vs the 15.75 GB v5e
budget and enabled per-module backbone remat. The bf16 staging + bf16
doff/dmask work since then cut training HBM; this tool re-asks the question
with `.compile().memory_analysis()` (no execution) so remat can be relaxed
if it fits — recompute is ~20-30% of the conv bucket.

Run: python tools/probe_train_memory.py [remat:0|1] (env TB=batch)
"""
import os
import sys

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fami_pose_tpu.config import get_default_cfg
from fami_pose_tpu.engine.steps import make_train_step
from fami_pose_tpu.engine.train_state import create_train_state
from fami_pose_tpu.models.fami_pose import FAMIPose
from fami_pose_tpu.models.hrnet import W48_EXTRA
from fami_pose_tpu.optim import build_optimizer

REMAT = (sys.argv[1] == "1") if len(sys.argv) > 1 else False
B = int(os.environ.get("TB", "8"))
model = FAMIPose(extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
                 dcn_max_offset=4, use_pallas_dcn=True, remat_backbone=REMAT)
cfg = get_default_cfg()
tx = build_optimizer(cfg, steps_per_epoch=100)
rng = np.random.RandomState(0)
h, w, n_sup = 384, 288, 4
batch = {
    "kf": jnp.asarray(rng.rand(B, h, w, 3), jnp.float32),
    "sup": jnp.asarray(rng.rand(B, h, w, 3 * n_sup), jnp.float32),
    "target": jnp.asarray(rng.rand(B, 96, 72, 17), jnp.float32),
    "target_weight": jnp.ones((B, 17), jnp.float32),
}
state = create_train_state(
    model, tx, jax.random.PRNGKey(0),
    (jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3 * n_sup))),
)
step = make_train_step(model, donate=True)
compiled = step.lower(state, batch).compile()
ma = compiled.memory_analysis()
gib = 1024 ** 3
print(
    f"remat={REMAT} batch={B}: "
    f"temp={ma.temp_size_in_bytes / gib:.2f} GiB "
    f"args={ma.argument_size_in_bytes / gib:.2f} GiB "
    f"out={ma.output_size_in_bytes / gib:.2f} GiB "
    f"(alias={ma.alias_size_in_bytes / gib:.2f}) "
    f"peak~={(ma.temp_size_in_bytes + ma.argument_size_in_bytes + ma.output_size_in_bytes - ma.alias_size_in_bytes) / gib:.2f} GiB"
)
