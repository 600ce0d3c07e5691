"""Microbench: int8 conv epilogue forms at the hot FAMI shape (96x72, C=48).

The int8 eval trace (docs/PERFORMANCE.md round 3) shows ~70 `clamp_convert`
fusions (conv + dequant + BN + relu + next-layer quantize) averaging ~5.3 ms
at batch 128 where the bare int8 conv costs 2.8 ms — the f32 elementwise
epilogue is the single largest bucket of the serving forward. This tool
measures, standalone on-chip, what each epilogue transformation is worth:

  A. current   : conv -> i32->f32 -> *(w_s*a_s) -> bf16 -> BN -> relu
                 -> next quantize (f32 mul/round/clip -> int8) -> conv
  B. bn_fold   : BN folded into the dequant scale/bias
                 (conv -> i32->f32 -> *S + B -> relu -> bf16) -> quantize -> conv
  C. chained   : B plus the requantize folded into the SAME epilogue, conv
                 emits int8 directly (no bf16 intermediate between convs)

All three compute the same function (up to f32 associativity). Run on the
TPU: python tools/bench_int8_epilogue.py [--batch 128] [--iters 30]
"""

import argparse
import functools
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def conv_i8(x8, k8):
    return jax.lax.conv_general_dilated(
        x8, k8, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def quantize(x, inv_s):
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) * inv_s), -127, 127
    ).astype(jnp.int8)


def chain_current(x, k8a, k8b, d):
    """Two conv layers, today's QuantConv + separate BN module epilogue."""
    y = conv_i8(quantize(x, 1.0 / d["a_s1"]), k8a)
    y = y.astype(jnp.float32) * (d["w_s1"] * d["a_s1"])
    y = y.astype(jnp.bfloat16)
    y = y * d["bn_mul"].astype(jnp.bfloat16) + d["bn_add"].astype(jnp.bfloat16)
    y = jax.nn.relu(y)
    z = conv_i8(quantize(y, 1.0 / d["a_s2"]), k8b)
    z = z.astype(jnp.float32) * (d["w_s2"] * d["a_s2"])
    return z.astype(jnp.bfloat16)


def chain_bnfold(x, k8a, k8b, d):
    """BN folded into the dequant scale/bias; still bf16 between convs."""
    S1 = d["w_s1"] * d["a_s1"] * d["bn_mul"]
    y = conv_i8(quantize(x, 1.0 / d["a_s1"]), k8a)
    y = jax.nn.relu(y.astype(jnp.float32) * S1 + d["bn_add"])
    y = y.astype(jnp.bfloat16)
    z = conv_i8(quantize(y, 1.0 / d["a_s2"]), k8b)
    z = z.astype(jnp.float32) * (d["w_s2"] * d["a_s2"])
    return z.astype(jnp.bfloat16)


def chain_int8(x, k8a, k8b, d):
    """BN fold + requantize in the same epilogue: int8 between convs."""
    S1 = d["w_s1"] * d["a_s1"] * d["bn_mul"] * (1.0 / d["a_s2"])
    B1 = d["bn_add"] * (1.0 / d["a_s2"])
    y = conv_i8(quantize(x, 1.0 / d["a_s1"]), k8a)
    y8 = jnp.clip(
        jnp.round(jax.nn.relu(y.astype(jnp.float32) * S1 + B1)), -127, 127
    ).astype(jnp.int8)
    z = conv_i8(y8, k8b)
    z = z.astype(jnp.float32) * (d["w_s2"] * d["a_s2"])
    return z.astype(jnp.bfloat16)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--hw", type=int, nargs=2, default=[96, 72])
    p.add_argument("--c", type=int, default=48)
    p.add_argument("--iters", type=int, default=30)
    args = p.parse_args()

    n, (h, w), c = args.batch, args.hw, args.c
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(n, h, w, c), jnp.bfloat16)
    k8a = jnp.asarray(rng.randint(-127, 128, (3, 3, c, c)), jnp.int8)
    k8b = jnp.asarray(rng.randint(-127, 128, (3, 3, c, c)), jnp.int8)
    d = {
        "a_s1": jnp.float32(0.05), "a_s2": jnp.float32(0.07),
        "w_s1": jnp.asarray(rng.rand(c) * 0.01 + 0.005, jnp.float32),
        "w_s2": jnp.asarray(rng.rand(c) * 0.01 + 0.005, jnp.float32),
        "bn_mul": jnp.asarray(rng.rand(c) + 0.5, jnp.float32),
        "bn_add": jnp.asarray(rng.randn(c) * 0.1, jnp.float32),
    }

    def measure(fn):
        @jax.jit
        def loop(x):
            def body(carry, _):
                out = fn(x + carry, k8a, k8b, d)
                s = jnp.sum(out.astype(jnp.float32))
                return (jnp.sign(s) * 1e-3).astype(jnp.bfloat16), s
            _, sums = jax.lax.scan(
                body, jnp.bfloat16(0.0), None, length=args.iters
            )
            return sums
        np.asarray(loop(x))
        t0 = time.perf_counter()
        s = np.asarray(loop(x))
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        assert np.isfinite(s).all()
        return dt

    ref = np.asarray(
        chain_current(x, k8a, k8b, d), np.float32
    )
    for name, fn in [("current", chain_current), ("bn_fold", chain_bnfold),
                     ("chained_int8", chain_int8)]:
        got = np.asarray(fn(x, k8a, k8b, d), np.float32)
        # same math up to f32 associativity + bf16 BN vs f32 fold + requant
        # boundary codes; report drift alongside time
        drift = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-9)
        ms = measure(fn)
        print(f"{name:14s} {ms:7.3f} ms/2-conv-chain  rel-drift {drift:.2e}")


if __name__ == "__main__":
    main()
