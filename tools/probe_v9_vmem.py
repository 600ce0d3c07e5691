"""Map the v9 DCN kernel's Mosaic scoped-vmem feasibility on-chip.

The strip-rolled v9 kernel unrolls all (2D+1)^2 window cells per tap;
Mosaic's scoped-vmem stack accounting grows ~linearly with
``cells * row_block``, so larger serving windows need smaller row blocks
(or a higher vmem cap) to compile. This probe compiles + times
``deform_conv2d_pallas`` v9 (vs the v3 baseline) across (D, row_block)
at a given feature shape and prints one line per combo:

  v9 D=2 tr=4 cap=48M: compile ok, 1.23 ms   |   OOM (scoped vmem ...)

Results feed the row-block selection rule in ``make_deform_conv_fn``
(ops/pallas/dcn.py) and the shootout table in docs/PERFORMANCE.md.

Run: python tools/probe_v9_vmem.py [--h 96] [--w 72] [--batch 16]
     [--ds 1 2 4] [--trs 16 8 4 2 1]
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
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--h", type=int, default=96)
    p.add_argument("--w", type=int, default=72)
    p.add_argument("--c", type=int, default=48)
    p.add_argument("--groups", type=int, default=12)
    p.add_argument("--ds", type=int, nargs="+", default=[1, 2, 4])
    p.add_argument("--trs", type=int, nargs="+", default=[16, 8, 4, 2, 1])
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--versions", type=int, nargs="+", default=[9, 3])
    p.add_argument("--check", action="store_true",
                   help="compare v9 output vs v3 (same D)")
    args = p.parse_args()

    from fami_pose_tpu.ops.pallas.dcn import deform_conv2d_pallas

    n, h, w, c, g = args.batch, args.h, args.w, args.c, args.groups
    k = 9
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    wgt = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c), jnp.float32)

    for d in args.ds:
        off = jnp.asarray(
            rng.rand(n, h, w, 2 * g * k) * 2 * d - d, jnp.bfloat16
        )
        msk = jnp.asarray(rng.rand(n, h, w, g * k), jnp.bfloat16)
        ref = None
        for kv in args.versions:
            trs = args.trs if kv in (9, 10, 11) else [16]
            for tr in trs:
                if h % tr:
                    continue
                tag = f"v{kv} D={d} tr={tr:<2d}"

                def call(x_, o_, m_, _kv=kv, _tr=tr, _d=d):
                    return deform_conv2d_pallas(
                        x_, o_, m_, wgt, bias, padding=3, dilation=3,
                        offset_groups=g, max_offset=_d, row_block=_tr,
                        kernel_version=_kv,
                    )

                # time `iters` sequential calls INSIDE one jit (data-
                # dependent carry): per-dispatch relay latency through the
                # axon tunnel (~100ms) would otherwise swamp the kernel
                @jax.jit
                def loop(x_, o_, m_, _call=call):
                    def body(carry, _):
                        out = _call(x_ + carry.astype(x_.dtype), o_, m_)
                        s = jnp.sum(out).astype(jnp.float32)
                        return jnp.sign(s) * jnp.float32(1e-3), s
                    _, sums = jax.lax.scan(
                        body, jnp.float32(0.0), None, length=args.iters
                    )
                    return sums

                fn = jax.jit(call)
                try:
                    t0 = time.perf_counter()
                    out = np.asarray(fn(x, off, msk))
                    np.asarray(loop(x, off, msk))
                    tc = time.perf_counter() - t0
                except Exception as e:  # noqa: BLE001 — report and continue
                    msg = str(e).split("\n")[0][:110]
                    print(f"{tag}: FAIL {msg}", flush=True)
                    continue
                t0 = time.perf_counter()
                sums = np.asarray(loop(x, off, msk))
                dt = (time.perf_counter() - t0) / args.iters * 1e3
                assert np.isfinite(sums).all()
                extra = ""
                if args.check:
                    if ref is None:
                        ref = out
                    else:
                        err = np.abs(out - ref).max()
                        extra = f"  max|diff vs first|={err:.2e}"
                print(
                    f"{tag}: ok  {dt:7.3f} ms  (compile+1st {tc:.1f}s){extra}",
                    flush=True,
                )


if __name__ == "__main__":
    main()
