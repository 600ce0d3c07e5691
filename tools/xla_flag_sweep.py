"""Sweep XLA/libtpu compiler flags over the bf16 parity eval forward.

XLA flags are process-global (parsed at backend init), so each combo runs in
a fresh subprocess against the same compiled-model measurement as bench.py's
``bf16_parity_clips_per_sec``. Flags that affect fusion/scheduling are the
only identified lever left on the bf16 batch path: the end-of-round-2 trace
shows conv fusions at ~4.5 ms/clip where XLA achieves ~2.3 ms/clip on the
same shapes standalone (docs/PERFORMANCE.md "Where the remaining headroom
is") — a scheduling/VMEM-budget artifact, not a FLOP floor.

Usage (on the TPU):
    python tools/xla_flag_sweep.py              # curated sweep
    python tools/xla_flag_sweep.py --combo "--xla_tpu_scoped_vmem_limit_kib=65536"

Env: BENCH_BATCH (128), BENCH_ITERS (10).
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# curated single-flag probes; winners get combined by hand
COMBOS = [
    "",  # baseline
    "--xla_tpu_scoped_vmem_limit_kib=32768",
    "--xla_tpu_scoped_vmem_limit_kib=65536",
    "--xla_tpu_scoped_vmem_limit_kib=98304",
    "--xla_tpu_enable_latency_hiding_scheduler=true",
    "--xla_tpu_enable_experimental_fusion_cost_model=true",
    "--xla_tpu_rwb_fusion=false",
    "--xla_tpu_enable_aggressive_loop_fusion=true",
    "--xla_tpu_licm_size_inflation_ratio=1",
    "--xla_tpu_enable_dot_strength_reduction=false",
]

CHILD = r"""
import os, time, json
import numpy as np
import jax, jax.numpy as jnp

cache = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from fami_pose_tpu.models.fami_pose import FAMIPose
from fami_pose_tpu.models.hrnet import W48_EXTRA

batch = int(os.environ.get("BENCH_BATCH", "128"))
iters = int(os.environ.get("BENCH_ITERS", "10"))
model = FAMIPose(extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
                 dcn_max_offset=4, use_pallas_dcn=True)
rng = np.random.RandomState(0)
kf = jnp.asarray(rng.rand(batch, 384, 288, 3), jnp.float32)
sup = jnp.asarray(rng.rand(batch, 384, 288, 12), jnp.float32)
v = jax.jit(lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1],
                               train=False))()

def fwd(vv, a, b):
    hm, _ = model.apply(vv, a, b, train=False)
    return hm.astype(jnp.float32)

@jax.jit
def loop(vv, a, b):
    def body(carry, _):
        out = fwd(vv, a + carry, b)
        s = jnp.sum(out)
        return jnp.sign(s) * jnp.float32(1e-6), s
    _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
    return sums

np.asarray(loop(v, kf, sup))
t0 = time.perf_counter()
sums = np.asarray(loop(v, kf, sup))
dt = time.perf_counter() - t0
assert np.isfinite(sums).all()
print(json.dumps({"clips_per_sec": round(batch * iters / dt, 2)}))
"""


def run_combo(flags: str) -> dict:
    env = dict(os.environ)
    base = env.get("XLA_FLAGS", "")
    env["XLA_FLAGS"] = (base + " " + flags).strip()
    # flag sweeps must not poison (or reuse) the persistent cache across
    # flag values — use a per-combo cache dir
    tag = flags.replace("--xla_tpu_", "").replace("=", "_") or "baseline"
    env["JAX_COMPILATION_CACHE_DIR"] = f"/tmp/jax_cache_sweep/{tag}"
    proc = subprocess.run(
        [sys.executable, "-c", CHILD], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=3600,
    )
    out = {"flags": flags or "(baseline)"}
    if proc.returncode != 0:
        out["error"] = proc.stderr.strip().splitlines()[-1][:200] if proc.stderr else "?"
        return out
    for line in reversed(proc.stdout.strip().splitlines()):
        try:
            out.update(json.loads(line))
            break
        except json.JSONDecodeError:
            continue
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--combo", action="append", default=None,
                   help="explicit flag string(s) to test instead of the "
                   "curated list")
    args = p.parse_args()
    combos = args.combo if args.combo else COMBOS
    results = []
    for flags in combos:
        r = run_combo(flags)
        print(json.dumps(r), flush=True)
        results.append(r)
    best = max(
        (r for r in results if "clips_per_sec" in r),
        key=lambda r: r["clips_per_sec"],
        default=None,
    )
    if best:
        print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
