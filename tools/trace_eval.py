"""Trace the eval forward on-chip and bucket device time by op class.

Parses the trace.json.gz that ``jax.profiler.trace`` writes (the
tensorboard_plugin_profile converter is broken against the installed TF, so
we read the chrome-trace events directly) and prints a per-bucket table.

Usage: python tools/trace_eval.py [--batch 128] [--int8] [--iters 5]
"""

import argparse
import glob
import gzip
import json
import os
import os.path as osp
import re
import sys
from collections import defaultdict

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def classify(name: str) -> str:
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "deform" in n or "dcn" in n:
        return "pallas_dcn"
    if "clamp_convert" in n or "convert" in n:
        return "convert(quant)"
    if n.startswith("convolution") or "convolution" in n or re.match(r"conv(\.|_|\d|$)", n):
        return "conv_fusion"
    if "while" in n:
        return "while(warp)"
    if "dynamic-update-slice" in n or "dynamic-slice" in n:
        return "dyn_slice"
    if "broadcast" in n:
        return "broadcast"
    if "transpose" in n:
        return "transpose"
    if "copy" in n:
        return "copy"
    if "reshape" in n:
        return "reshape"
    if "pad" in n:
        return "pad"
    if "reduce" in n:
        return "reduce"
    if "fusion" in n:
        return "other_fusion"
    if "convert" in n:
        return "convert"
    return "misc"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--int8", action="store_true")
    p.add_argument("--dcn", type=int, default=4)
    p.add_argument("--warp-impl", default="matmul",
                   choices=("slice", "matmul", "pallas"),
                   help="global-alignment warp implementation")
    p.add_argument("--out", default="/tmp/eval_trace")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--streaming", action="store_true",
                   help="trace the streaming step (engine/streaming.py) "
                        "instead of the batch forward")
    args = p.parse_args()

    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    model = FAMIPose(
        extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
        dcn_max_offset=args.dcn, use_pallas_dcn=True,
        backbone_quant="int8" if args.int8 else "off",
        warp_impl=args.warp_impl,
    )
    b, h, w, n_sup = args.batch, 384, 288, 4
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(b, h, w, 3 * n_sup), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1], train=False)
    )()
    if args.int8:
        from fami_pose_tpu.models.quant import calibrate

        variables = dict(variables)
        variables["quant"] = jax.jit(
            lambda v, a, bb: calibrate(
                model.clone(backbone_quant="calibrate"), v, [(a, bb)],
                train=False,
            )
        )(variables, kf[:8], sup[:8])

    if args.streaming:
        from fami_pose_tpu.engine.streaming import init_state, make_step

        sstep = jax.jit(make_step(model, variables, 3))
        state = jax.jit(
            lambda f: init_state(model, variables, f, 3)
        )(kf)
        state, (out0, _) = sstep(state, kf)
        np.asarray(out0)  # compile+warm

        os.system(f"rm -rf {args.out}")
        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                state, (out, _) = sstep(state, kf)
            np.asarray(out)
    else:
        @jax.jit
        def fwd(v, a, bb):
            final, _ = model.apply(v, a, bb, train=False)
            return final.astype(jnp.float32)

        np.asarray(fwd(variables, kf, sup))  # compile+warm

        os.system(f"rm -rf {args.out}")
        with jax.profiler.trace(args.out):
            for _ in range(args.iters):
                out = fwd(variables, kf, sup)
            np.asarray(out)

    traces = glob.glob(f"{args.out}/**/*.trace.json.gz", recursive=True)
    assert traces, f"no trace written under {args.out}"
    with gzip.open(sorted(traces)[-1], "rt") as f:
        data = json.load(f)

    # device-side complete events only (TensorCore pid rows)
    pid_names = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {
        p for p, name in pid_names.items()
        if "TPU" in name or "/device" in name.lower()
    }

    buckets = defaultdict(float)
    ops = defaultdict(float)
    total = 0.0
    for e in data["traceEvents"]:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        # skip run_module wrappers that span the whole step
        if name.startswith("jit_") or "XLA Modules" in pid_names.get(e["pid"], ""):
            continue
        dur = e.get("dur", 0) / 1e3  # -> ms
        buckets[classify(name)] += dur
        ops[name] += dur
        total += dur

    it = args.iters
    print(f"\n== device time per call (batch {b}, {it} iters, "
          f"{'int8' if args.int8 else 'bf16'}) ==")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"{k:16s} {v / it:9.2f} ms  ({100 * v / total:5.1f}%)")
    print(f"{'TOTAL':16s} {total / it:9.2f} ms   "
          f"-> {b * it / (total / 1e3):.1f} clips/s (device-busy bound)")

    print(f"\n== top {args.top} ops ==")
    for name, v in sorted(ops.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{v / it:9.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
