"""Forensics for the r4 driver-run `pipeline_clips_per_sec` anomaly (4.46
clips/s vs 76.48 in r3 and 76.5 in the builder's same-day rerun — a ~17x
mode-level slowdown; VERDICT r4 "What's weak" #2).

Two questions, answered with data:

1. **Lowering**: does the bf16 D=4 flip pipeline still select the v3 DCN
   kernel after the r4 auto-select rework (ops/pallas/dcn.py
   make_deform_conv_fn)? We trace the exact bench `pipeline_fn` and count
   `pallas_call` names in the jaxpr — if the (2D+1)^2-unrolled v9 leaked
   into D=4, its measured 43.1 ms vs v3's 24.2 ms (docs/PERFORMANCE.md r4
   shootout) plus Mosaic scoped-vmem pressure co-resident with the flip
   second forward would be a structural (reproducible) slowdown.

2. **Stability**: run the bench's exact timed loop R times back-to-back and
   print every repeat. A structural cause reproduces across repeats; a
   transient (relay hiccup, host paging, chip contention) shows as isolated
   outlier repeats against a stable median.

Usage (on the real chip):
    python tools/diagnose_pipeline_anomaly.py [--repeats 6] [--batch 128]
        [--iters 20]

Writes its verdict lines to stderr; exits nonzero if the lowering check
fails (v9 found at D=4).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def log(msg):
    print(f"[diagnose] {msg}", file=sys.stderr, flush=True)


def count_pallas_calls(jaxpr):
    """Recursively count pallas_call primitives by kernel name."""
    counts = {}

    def walk(jx):
        for eqn in jx.eqns:
            if eqn.primitive.name == "pallas_call":
                # kernel function name travels in the kernel jaxpr's debug
                # info ("<func> at <file>:<line>"), not a `name` param
                kj = eqn.params.get("jaxpr")
                dbg = getattr(kj, "debug_info", None)
                src = getattr(dbg, "func_src_info", None) or "?"
                name = str(src).split(" at ")[0]
                counts[name] = counts.get(name, 0) + 1
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):  # ClosedJaxpr
                    walk(v.jaxpr)
                elif isinstance(v, (list, tuple)):
                    for u in v:
                        if hasattr(u, "jaxpr"):
                            walk(u.jaxpr)
        return counts

    return walk(jaxpr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=6)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--skip-timing", action="store_true")
    ap.add_argument("--skip-lowering", action="store_true",
                    help="timing only — run the lowering check in its own "
                    "process: holding the full-pipeline jaxpr alive was "
                    "observed to stall the subsequent trace/lower for >10 "
                    "min on the relayed platform")
    args = ap.parse_args()

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "/root/repo/.jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build
    from fami_pose_tpu.data.keypoints import COCO_FLIP_PAIRS
    from fami_pose_tpu.ops.heatmap import dark_get_final_preds
    from fami_pose_tpu.ops.nms import oks_nms_device
    from fami_pose_tpu.ops.pose import flip_back_nhwc

    batch, iters = args.batch, args.iters
    h, w = 384, 288
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(batch, h, w, 12), jnp.float32)
    center = jnp.tile(jnp.asarray([[144.0, 192.0]], jnp.float32), (batch, 1))
    scale = jnp.tile(jnp.asarray([[1.44, 1.92]], jnp.float32), (batch, 1))

    model = build(jnp.bfloat16, False, 4, True)  # bf16, D=4 — the anomaly mode
    v = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1],
                           train=False)
    )()

    def pipeline(vv, kf_x, sup_x):  # exact bench.py pipeline_fn body
        final, _ = model.apply(vv, kf_x, sup_x, train=False)
        f_final, _ = model.apply(
            vv, kf_x[:, :, ::-1, :], sup_x[:, :, ::-1, :], train=False
        )
        final = (final + flip_back_nhwc(f_final, COCO_FLIP_PAIRS)) * 0.5
        hm = jnp.transpose(final.astype(jnp.float32), (0, 3, 1, 2))
        preds, maxvals = dark_get_final_preds(hm, center, scale)
        kpts = jnp.concatenate([preds, maxvals], axis=-1)
        scores = jnp.mean(maxvals[..., 0], axis=-1)
        areas = jnp.prod(scale * 200.0, axis=-1)
        keep = oks_nms_device(kpts, scores, areas,
                              jnp.ones((batch,), bool), thr=0.9)
        return kpts * keep[:, None, None].astype(jnp.float32)

    # ---- 1. lowering check -------------------------------------------------
    ok_lowering = True
    if args.skip_lowering:
        counts = {}
    else:
        log("tracing pipeline jaxpr (lowering check)...")
        jx = jax.make_jaxpr(pipeline)(v, kf, sup)
        counts = count_pallas_calls(jx.jaxpr)
        del jx
        log(f"pallas_call kernels in bf16 D=4 flip pipeline: {counts}")
        v9 = sum(n for k, n in counts.items() if "v9" in k or "v10" in k
                 or "v11" in k)
        v3 = sum(n for k, n in counts.items() if "v3" in k)
        if v9:
            log(f"FAIL: {v9} unrolled-window kernels at D=4 — "
                "auto-select broken")
            ok_lowering = False
        elif v3 == 0 and counts:
            log("WARN: no v3 kernels found — kernel naming changed? inspect "
                f"{sorted(counts)}")
        else:
            log(f"OK: D=4 lowers to v3 ({v3} call sites), no unrolled "
                "kernels")

    if args.skip_timing:
        sys.exit(0 if ok_lowering else 1)

    # ---- 2. repeat-stability timing ---------------------------------------
    @jax.jit
    def loop(vv, kf_x, sup_x):  # exact bench.py measure() loop
        def body(carry, _):
            out = pipeline(vv, kf_x + carry, sup_x)
            s = jnp.sum(out)
            return jnp.sign(s) * jnp.float32(1e-6), s
        _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return sums

    # split compile from first execution: the r4 4.46 reading and the first
    # diagnose attempt (>900s warmup) can't be attributed without knowing
    # which phase was slow
    log("lowering timed loop...")
    t0 = time.perf_counter()
    lowered = loop.lower(v, kf, sup)
    log(f"trace+lower {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    compiled = lowered.compile()
    log(f"compile {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    np.asarray(compiled(v, kf, sup))
    dt = time.perf_counter() - t0
    log(f"first execution {dt:.1f}s -> {batch * iters / dt:.2f} clips/s")
    loop = compiled

    rates = []
    for r in range(args.repeats):
        t0 = time.perf_counter()
        sums = np.asarray(loop(v, kf, sup))
        dt = time.perf_counter() - t0
        assert np.isfinite(sums).all()
        rates.append(round(batch * iters / dt, 2))
        log(f"repeat {r}: {dt:.2f}s -> {rates[-1]} clips/s")

    med = float(np.median(rates))
    outliers = [x for x in rates if not (0.5 <= x / med <= 2.0)]
    log(f"rates={rates} median={med} min={min(rates)} max={max(rates)}")
    if outliers:
        log(f"ANOMALY REPRODUCED within-process: outlier repeats {outliers} "
            f"vs median {med}")
    else:
        log("stable within-process — if the 4.46 reading recurs only in "
            "fresh processes, the cause is environmental (relay/compile-"
            "cache/host state), not the compiled program")
    sys.exit(0 if ok_lowering else 1)


if __name__ == "__main__":
    main()
