"""Trace the W48 train step on-chip and bucket device time by op class.

Same chrome-trace parsing as tools/trace_eval.py (the tensorboard profile
converter is broken against the installed TF). Used to pin down the
convert/reduce bucket (f32 grad accumulation vs BN stat reductions vs loss
math) that round 2 left unattributed.

Usage: python tools/trace_train.py [--batch 8] [--iters 3]
"""

import argparse
import glob
import gzip
import json
import os
import os.path as osp
import sys
from collections import defaultdict

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from trace_eval import classify  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--out", default="/tmp/train_trace")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--bf16-grads", action="store_true")
    p.add_argument("--no-donate", action="store_true")
    args = p.parse_args()

    from fami_pose_tpu.config import get_default_cfg
    from fami_pose_tpu.engine.steps import make_train_step
    from fami_pose_tpu.engine.train_state import create_train_state
    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import W48_EXTRA
    from fami_pose_tpu.optim import build_optimizer

    model = FAMIPose(extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
                     dcn_max_offset=4, use_pallas_dcn=True,
                     remat_backbone=True)
    cfg = get_default_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=100)
    rng = np.random.RandomState(0)
    b, h, w, n_sup = args.batch, 384, 288, 4
    batch = {
        "kf": jnp.asarray(rng.rand(b, h, w, 3), jnp.float32),
        "sup": jnp.asarray(rng.rand(b, h, w, 3 * n_sup), jnp.float32),
        "target": jnp.asarray(rng.rand(b, 96, 72, 17), jnp.float32),
        "target_weight": jnp.ones((b, 17), jnp.float32),
    }
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, h, w, 3)), jnp.zeros((1, h, w, 3 * n_sup))),
    )
    # donate by default: state threads through the loop, so donation is
    # safe here and matches the trainer's real step — tracing without it
    # adds ~50 ms/step of output copies that misattribute the copy bucket
    step = make_train_step(model, donate=not args.no_donate,
                           bf16_grads=args.bf16_grads)
    state, m = step(state, batch)  # compile+warm
    float(m["loss"])

    os.system(f"rm -rf {args.out}")
    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            state, m = step(state, batch)
        float(m["loss"])

    traces = glob.glob(f"{args.out}/**/*.trace.json.gz", recursive=True)
    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)
    pid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p_ for p_, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }
    buckets = defaultdict(float)
    ops = defaultdict(float)
    total = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        if name.startswith("jit_"):
            continue
        dur = e.get("dur", 0) / 1e3
        buckets[classify(name)] += dur
        ops[name] += dur
        total += dur

    it = args.iters
    print(f"\n== train-step device time per step (batch {b}) ==")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{k:16s} {v / it:9.2f} ms  ({100 * v / total:5.1f}%)")
    print(f"{'TOTAL':16s} {total / it:9.2f} ms")
    print(f"\n== top {args.top} ops ==")
    for name, v in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v / it:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
