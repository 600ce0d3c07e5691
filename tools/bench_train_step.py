"""Train-step benchmark: flagship W48, bf16, remat, Pallas DCN.

Run: python tools/bench_train_step.py  (env: TB=batch, TI=iters)
Recorded numbers live in docs/PERFORMANCE.md.
"""
import os
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
import time, sys
sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))

from fami_pose_tpu.config import get_default_cfg
from fami_pose_tpu.engine.steps import make_train_step
from fami_pose_tpu.engine.train_state import create_train_state
from fami_pose_tpu.models.fami_pose import FAMIPose
from fami_pose_tpu.models.hrnet import W48_EXTRA
from fami_pose_tpu.optim import build_optimizer

B = int(os.environ.get("TB", "8"))
ITERS = int(os.environ.get("TI", "10"))
model = FAMIPose(extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
                 dcn_max_offset=4, use_pallas_dcn=True, remat_backbone=os.environ.get("REMAT", "0") == "1")
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
BF16G = os.environ.get("BF16_GRADS", "1") == "1"
step = make_train_step(model, donate=True, bf16_grads=BF16G)
print(f"bf16_grads={BF16G}", flush=True)

t0 = time.perf_counter()
state, metrics = step(state, batch)
loss0 = float(metrics["loss"])
print(f"compile+first step: {time.perf_counter()-t0:.1f}s loss={loss0:.4f}", flush=True)

t0 = time.perf_counter()
for _ in range(ITERS):
    state, metrics = step(state, batch)
final = float(metrics["loss"])
dt = (time.perf_counter() - t0) / ITERS
print(f"train step: {dt*1e3:.1f} ms/step @ batch {B} ({B/dt:.1f} clips/s) loss={final:.4f}")
