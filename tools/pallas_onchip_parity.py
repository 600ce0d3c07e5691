"""On-chip Pallas DCN parity artifact (VERDICT r2 #8).

Every Pallas parity test in ``tests/`` runs in interpret mode (CPU host);
this tool runs the SAME comparisons on the real chip, guarding against
Mosaic lowering changes:

  * fused Pallas kernel (v3, the default) vs the XLA windowed reference
    (``ops.deform_conv.deform_conv2d_windowed``) — identical semantics, so
    the delta is pure float error;
  * both vs the exact unbounded gather path on offsets drawn INSIDE the
    window (where all three must agree);
  * checksums at eval scale with model-shaped inputs.

Run on the TPU: ``python tools/pallas_onchip_parity.py``; output is
committed to ``docs/PALLAS_ONCHIP_PARITY.md``.
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    from fami_pose_tpu.ops.deform_conv import (
        deform_conv2d,
        deform_conv2d_windowed,
    )
    from fami_pose_tpu.ops.pallas.dcn import deform_conv2d_pallas

    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()[0]})")
    if backend == "cpu":
        print("WARNING: running on CPU -> Pallas interpret mode; this "
              "artifact is only meaningful on a TPU.")

    n, h, w, c, g, k = 8, 96, 72, 48, 12, 3
    d_max = 4
    rng = np.random.RandomState(19970808)
    x = jnp.asarray(rng.rand(n, h, w, c), jnp.float32)
    # model-shaped offsets: mostly sub-pixel, a tail up to ~d_max (matches
    # the measured offset-conv distribution, tools/ab_dcn_bound_ap.py)
    off = jnp.asarray(
        rng.randn(n, h, w, 2 * g * k * k) * 0.8, jnp.float32
    ).clip(-d_max + 1e-3, d_max - 1e-3)
    msk = jnp.asarray(rng.rand(n, h, w, g * k * k), jnp.float32)
    wgt = jnp.asarray(rng.randn(k, k, c, c) * 0.05, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)

    kw = dict(padding=3, dilation=3, offset_groups=g)

    outs = {}
    outs["pallas_v3"] = np.asarray(jax.jit(
        lambda *a: deform_conv2d_pallas(*a, max_offset=d_max, **kw)
    )(x, off, msk, wgt, bias), np.float32)
    outs["xla_windowed"] = np.asarray(jax.jit(
        lambda *a: deform_conv2d_windowed(*a, max_offset=d_max, **kw)
    )(x, off, msk, wgt, bias), np.float32)
    outs["exact_gather"] = np.asarray(jax.jit(
        lambda *a: deform_conv2d(*a, stride=1, **kw)
    )(x, off, msk, wgt, bias), np.float32)

    scale = np.abs(outs["exact_gather"]).max()
    print(f"\noutput range (exact, max-abs): {scale:.4f}; "
          f"batch {n}, d_max {d_max}")
    print(f"{'pair':28s} {'max|d|':>12s} {'max|d|/rng':>12s} {'mean|d|':>12s}")
    pairs = [
        ("pallas_v3 vs xla_windowed", "pallas_v3", "xla_windowed"),
        ("pallas_v3 vs exact_gather", "pallas_v3", "exact_gather"),
        ("xla_windowed vs exact", "xla_windowed", "exact_gather"),
    ]
    worst = 0.0
    for name, a, b in pairs:
        d = np.abs(outs[a] - outs[b])
        print(f"{name:28s} {d.max():12.3e} {d.max() / scale:12.3e} "
              f"{d.mean():12.3e}")
        worst = max(worst, d.max() / scale)
    print(f"\nchecksums: " + ", ".join(
        f"{k}={float(v.sum()):.6f}" for k, v in outs.items()))
    # threshold: on-chip f32 matmuls run at default MXU precision (bf16
    # passes), so legit implementations differ at the ~1e-3-relative level;
    # interpret-mode tests pin the same comparison at 1e-5 on the CPU host
    status = "PASS" if worst < 1e-3 else "FAIL"
    print(f"{status}: worst relative delta {worst:.3e} "
          f"(threshold 1e-3 of output range at default MXU precision)")

    warp_parity()
    backward_parity()


def backward_parity():
    """All five gradients of the fused backward kernels vs ``jax.vjp`` of
    the XLA windowed reference — on-chip (the interpret-mode tests pin the
    same comparison on the CPU host). dcol is an MXU matmul at default
    precision, so dweight/doffset inherit ~1e-4/~1e-2-of-max deltas from
    bf16-pass rounding + cancellation in the hat-derivative terms; dx and
    dmask are VPU-only and sit at f32 epsilon."""
    from fami_pose_tpu.ops.deform_conv import deform_conv2d_windowed
    from fami_pose_tpu.ops.pallas.dcn_bwd import (
        deform_conv2d_windowed_bwd_pallas,
    )

    n, h, w, c, co, g, d_max = 2, 32, 72, 48, 48, 12, 4
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.float32)
    off = jnp.asarray(rng.randn(n, h, w, 2 * g * 9) * 3, jnp.float32)
    msk = jnp.asarray(rng.rand(n, h, w, g * 9), jnp.float32)
    wgt = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
    gout = jnp.asarray(rng.randn(n, h, w, co), jnp.float32)

    def f(x, off, msk, wgt):
        return deform_conv2d_windowed(
            x, off, msk, wgt, None, padding=3, dilation=3,
            offset_groups=g, max_offset=d_max,
        )

    _, vjp = jax.vjp(f, x, off, msk, wgt)
    ref = vjp(gout)
    got = deform_conv2d_windowed_bwd_pallas(
        x, off, msk, wgt, gout, padding=3, dilation=3, offset_groups=g,
        max_offset=d_max, row_block=16,
    )
    print(f"\n--- backward kernels vs jax.vjp(xla_windowed) (batch {n}) ---")
    tols = {"dx": 1e-5, "doffset": 5e-2, "dmask": 1e-5, "dweight": 1e-3}
    worst_name = None
    for name, r, p in zip(("dx", "doffset", "dmask", "dweight"), ref, got):
        r = np.asarray(r, np.float32)
        p = np.asarray(p, np.float32)
        rel = np.abs(r - p).max() / (np.abs(r).max() + 1e-9)
        ok = rel <= tols[name]
        if not ok:
            worst_name = name
        print(f"{name:8s} max|d|/max|ref| {rel:.3e} (tol {tols[name]:g}) "
              f"{'PASS' if ok else 'FAIL'}")
    if worst_name:
        print(f"FAIL: backward parity ({worst_name})")


def warp_parity():
    """Fused Pallas warp AND MXU matmul warp vs the XLA ``warp_translate``
    path — on-chip, FAMI feature scale. f32 is bit-exact for both (pallas:
    pure VPU blend; matmul: HIGHEST precision, two nonzeros per row); bf16
    differs by one output rounding."""
    from fami_pose_tpu.ops.warp import warp_translate, warp_translate_matmul
    from fami_pose_tpu.ops.pallas.warp import warp_translate_pallas

    n, h, w, c = 32, 96, 72, 48
    rng = np.random.RandomState(7)
    offs = jnp.asarray(
        np.concatenate(
            [
                np.array([[0, 0], [3, -5], [0.5, -1.25], [40, -40]], np.float32),
                rng.uniform(-20, 20, (n - 4, 2)).astype(np.float32),
            ]
        )
    )
    print(f"\n--- warp_translate: Pallas + matmul vs XLA (batch {n}) ---")
    worst = 0.0
    for dt, tols, label in [
        # pallas f32 is bit-exact (same blend order); matmul rounds once
        # more (row-then-column blend) -> 1 ulp
        (jnp.float32, {"pallas": 0.0, "matmul": 2.4e-7}, "f32"),
        (jnp.bfloat16, {"pallas": 2 ** -7, "matmul": 2 ** -6}, "bf16"),
    ]:
        imgs = jnp.asarray(rng.rand(n, h, w, c), dt)
        ref = np.asarray(
            jax.jit(lambda a, b: warp_translate(a, b, max_shift=26))(imgs, offs),
            np.float32,
        )
        for impl, fn in (
            ("pallas",
             lambda a, b: warp_translate_pallas(a, b, max_shift=26)),
            ("matmul", jax.jit(
                lambda a, b: warp_translate_matmul(a, b, max_shift=26))),
        ):
            tol = tols[impl]
            got = np.asarray(fn(imgs, offs), np.float32)
            d = np.abs(ref - got).max()
            ok = d <= tol
            worst = max(worst, 0.0 if ok else d)
            print(f"{impl:7s} {label:20s} max|d| {d:.3e} (tol {tol:g}) "
                  f"{'PASS' if ok else 'FAIL'}")
    if worst:
        print(f"FAIL: warp parity worst delta {worst:.3e}")


if __name__ == "__main__":
    main()
