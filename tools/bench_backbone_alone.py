"""Backbone-in-isolation timing: is the alignment head poisoning layouts?

The full int8 eval trace (tools/trace_eval.py) books ~417 ms of
conv+quant fusions per batch-128 step (= 640 backbone images, 5-frame
fold). This tool times the SAME backbone work alone — no DCN custom
calls, no alignment head — at the same image batch. If the isolated
backbone matches the in-graph conv bucket, the convs are simply at their
in-graph rate and there is no layout poisoning to fix; if it is
significantly faster, XLA's global layout assignment is pessimizing the
backbone to satisfy the head/DCN boundary and isolation (explicit layout
casts / optimization barriers at the backbone->head seam) is worth
pursuing.

Run on the TPU: python tools/bench_backbone_alone.py [--images 640]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--images", type=int, default=640,
                   help="backbone image batch (= 5 x clip batch)")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--bf16", action="store_true",
                   help="time the bf16 backbone instead of int8")
    args = p.parse_args()

    from fami_pose_tpu.models.hrnet import HRNet, W48_EXTRA
    from fami_pose_tpu.models.quant import calibrate

    quant = "off" if args.bf16 else "int8"
    model = HRNet(extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
                  quant=quant)
    n, h, w = args.images, 384, 288
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(n, h, w, 3), jnp.float32)

    v = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), x[:1], False)
    )()
    if quant == "int8":
        v = dict(v)
        v["quant"] = jax.jit(
            lambda vv, a: calibrate(
                model.clone(quant="calibrate"), vv, [(a, False)]
            )
        )(v, x[:8])

    @jax.jit
    def loop(vv, xx):
        def body(carry, _):
            hm, feats = model.apply(vv, xx + carry, False)
            s = jnp.sum(hm.astype(jnp.float32)) + jnp.sum(
                feats[0].astype(jnp.float32)
            )
            return jnp.sign(s) * jnp.float32(1e-6), s
        _, sums = jax.lax.scan(body, jnp.float32(0.0), None,
                               length=args.iters)
        return sums

    np.asarray(loop(v, x))
    t0 = time.perf_counter()
    s = np.asarray(loop(v, x))
    dt = (time.perf_counter() - t0) / args.iters * 1e3
    assert np.isfinite(s).all()
    clips = n / 5
    print(f"{quant} backbone alone: {dt:.1f} ms / {n} images "
          f"({dt / clips:.2f} ms per 5-frame clip; "
          f"{clips / (dt / 1e3):.1f} clips/s backbone-only)")


if __name__ == "__main__":
    main()
