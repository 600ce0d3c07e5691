"""Op-level DCN kernel shootout at FAMI serving scale (on the TPU).

Times `deform_conv2d_pallas` kernel versions on the flagship DCN shape
(batch x 96x72, C=48->48, 3x3 dil 3, 12 offset groups) at the given
window D. Results recorded in docs/PERFORMANCE.md.

Usage: python tools/bench_dcn_kernels.py [--batch 128] [--d 1]
       [--versions 3 9] [--iters 20]
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--d", type=int, default=1)
    p.add_argument("--versions", type=int, nargs="+", default=[3, 9])
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--h", type=int, default=96)
    p.add_argument("--w", type=int, default=72)
    p.add_argument("--c", type=int, default=48)
    p.add_argument("--groups", type=int, default=12)
    p.add_argument("--check", action="store_true",
                   help="also compare outputs across versions")
    args = p.parse_args()

    from fami_pose_tpu.ops.pallas.dcn import deform_conv2d_pallas

    n, h, w, c, g, d = args.batch, args.h, args.w, args.c, args.groups, args.d
    k = 9
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    off = jnp.asarray(rng.rand(n, h, w, 2 * g * k) * 2 * d - d, jnp.bfloat16)
    msk = jnp.asarray(rng.rand(n, h, w, g * k), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)

    outs = {}
    for kv in args.versions:
        fn = jax.jit(
            lambda x_, o_, m_: deform_conv2d_pallas(
                x_, o_, m_, wgt, bias, padding=3, dilation=3,
                offset_groups=g, max_offset=d, row_block=16,
                kernel_version=kv,
            )
        )

        @jax.jit
        def loop(x_, o_, m_):
            def body(carry, _):
                y = fn(x_ + carry, o_, m_)
                s = jnp.sum(y.astype(jnp.float32))
                return jnp.sign(s).astype(x_.dtype) * jnp.bfloat16(1e-3), s
            _, sums = jax.lax.scan(
                body, jnp.bfloat16(0.0), None, length=args.iters
            )
            return sums

        try:
            np.asarray(loop(x, off, msk))
        except Exception as e:  # Mosaic limits etc. — record and move on
            print(f"v{kv}: FAILED to compile/run: {type(e).__name__}: "
                  f"{str(e)[:200]}")
            continue
        t0 = time.perf_counter()
        sums = np.asarray(loop(x, off, msk))
        dt = time.perf_counter() - t0
        assert np.isfinite(sums).all()
        ms = dt / args.iters * 1e3
        print(f"v{kv}: {ms:.2f} ms/call (batch {n}, D={d})")
        if args.check:
            outs[kv] = np.asarray(fn(x, off, msk), np.float32)

    if args.check and len(outs) > 1:
        kvs = sorted(outs)
        ref = outs[kvs[0]]
        for kv in kvs[1:]:
            delta = np.max(np.abs(outs[kv] - ref))
            rel = delta / max(np.max(np.abs(ref)), 1e-9)
            print(f"v{kv} vs v{kvs[0]}: max|d| {delta:.3e} (rel {rel:.3e})")


if __name__ == "__main__":
    main()
