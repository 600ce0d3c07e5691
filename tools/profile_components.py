"""Component-level timing of the FAMIPose forward on the attached chip.

Times each piece with the chained-scan methodology (see docs/PERFORMANCE.md):
N iterations inside one jit, chained through a bounded data-dependent carry,
result fetched to host. Reports per-clip milliseconds so pieces can be
compared against the full forward.

Usage: python tools/profile_components.py [--batch 32] [--iters 20]
       [--only full,backbone,dcn,conv48,...]
"""

import argparse
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed(fn, args, iters, perturb=None):
    """Time `iters` chained applications of fn; returns seconds per call."""
    if perturb is None:
        perturb = lambda a, c: (a[0] + c,) + tuple(a[1:])

    @jax.jit
    def loop(*a):
        def body(carry, _):
            out = fn(*perturb(a, carry))
            s = jnp.sum(out.astype(jnp.float32))
            return jnp.sign(s) * jnp.float32(1e-6), s

        _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return sums

    np.asarray(loop(*args))  # compile + warm
    t0 = time.perf_counter()
    s = np.asarray(loop(*args))
    dt = time.perf_counter() - t0
    assert np.isfinite(s).all(), "non-finite outputs in timing loop"
    return dt / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--only", type=str, default="")
    args = p.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import HRNet, W48_EXTRA

    b = args.batch
    it = args.iters
    h, w, n_sup = 384, 288, 4
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)
    rows = []

    def report(name, sec, per_clip_divisor=b):
        ms = sec * 1e3
        rows.append((name, ms, ms / per_clip_divisor))
        print(f"{name:36s} {ms:9.2f} ms/call   {ms / per_clip_divisor:7.3f} ms/clip")

    def want(name):
        return only is None or name in only

    # ---- full model -------------------------------------------------------
    model = FAMIPose(extra=W48_EXTRA, num_joints=17, dtype=dt,
                     dcn_max_offset=4, use_pallas_dcn=True)
    kf = jnp.asarray(rng.rand(b, h, w, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(b, h, w, 3 * n_sup), jnp.float32)
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1], train=False)
    )()

    if want("full"):
        def fwd(kf_x, sup_x):
            final, _ = model.apply(variables, kf_x, sup_x, train=False)
            return final.astype(jnp.float32)
        report("full eval forward", timed(fwd, (kf, sup), it))

    # ---- backbone over the folded 5-frame batch ---------------------------
    bb = HRNet(extra=W48_EXTRA, num_joints=17, dtype=dt)
    xb = jnp.asarray(rng.rand(b * (n_sup + 1), h, w, 3), jnp.float32)
    bvars = jax.jit(lambda: bb.init(jax.random.PRNGKey(0), xb[:1]))()

    if want("backbone"):
        def bb_fwd(x):
            hm, feats = bb.apply(bvars, x)
            return feats[0].astype(jnp.float32)
        report("backbone (5 frames/clip)", timed(bb_fwd, (xb,), it))

    # ---- one fused-Pallas DCN call at model shapes -------------------------
    if want("dcn"):
        from fami_pose_tpu.ops.pallas.dcn import deform_conv2d_pallas

        c, g, k = 48, 12, 3
        x = jnp.asarray(rng.rand(b, 96, 72, c), jnp.float32)
        off = jnp.asarray(rng.randn(b, 96, 72, 2 * g * k * k) * 2, jnp.float32)
        msk = jnp.asarray(rng.rand(b, 96, 72, g * k * k), jnp.float32)
        wgt = jnp.asarray(rng.randn(k, k, c, c) * 0.05, jnp.float32)

        def dcn(x_, off_, msk_, wgt_):
            return deform_conv2d_pallas(
                x_, off_, msk_, wgt_, padding=3, dilation=3,
                offset_groups=g, max_offset=4, row_block=16,
            )
        report("1x pallas DCN (of 4)",
               timed(dcn, (x, off, msk, wgt), it))

    # ---- isolated XLA convs at backbone shapes -----------------------------
    conv_cases = {
        "conv48": (b * 5, 96, 72, 48, 48),
        "conv96": (b * 5, 48, 36, 96, 96),
        "conv192": (b * 5, 24, 18, 192, 192),
        "conv384": (b * 5, 12, 9, 384, 384),
    }
    for name, (nb, hh, ww, ci, co) in conv_cases.items():
        if not want(name):
            continue
        x = jnp.asarray(rng.rand(nb, hh, ww, ci), dt)
        wgt = jnp.asarray(rng.randn(3, 3, ci, co) * 0.05, dt)

        def conv(x_, w_):
            return jax.lax.conv_general_dilated(
                x_, w_, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        sec = timed(conv, (x, wgt), it)
        flops = 2 * nb * hh * ww * 9 * ci * co
        tf = flops / sec / 1e12
        report(f"XLA 3x3 {name} ({nb}x{hh}x{ww})", sec)
        print(f"{'':36s} -> {tf:6.1f} TFLOP/s")

    print()
    for name, ms, per_clip in rows:
        print(f"| {name} | {ms:.2f} | {per_clip:.3f} |")


if __name__ == "__main__":
    main()
