"""Mosaic capability watch (VERDICT r2 #10 / ROUND2_NOTES #5).

Probes, on the attached chip, the Mosaic features whose absence shaped the
round-2 kernel design. If any flips to SUPPORTED on a newer Mosaic, the
corresponding retired design becomes live again:

  * bf16 lane gather (``take_along_axis`` on (sublane, 128) bf16 tiles) —
    would let DCN x-staging drop to bf16 (halves the biggest prep copies'
    source);
  * 3-D gather (batched-row gathers) — would enable v6/v7-class
    row-stacked kernels;
  * dynamic lane rotate (``pltpu.roll`` with a traced shift) — would enable
    a fully-packed warp-translate kernel.

Run: python tools/mosaic_watch.py  (safe: each probe is compiled in
isolation and failures are caught + reported).
"""

import os
import os.path as osp
import sys
import traceback

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def probe(name, fn):
    try:
        out = fn()
        np.asarray(out)
        print(f"{name:28s} SUPPORTED")
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:110]
        print(f"{name:28s} unsupported: {msg}")
        return False


def bf16_gather():
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    x = jnp.asarray(np.random.rand(16, 128), jnp.bfloat16)
    idx = jnp.asarray(np.random.randint(0, 128, (16, 128)), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.bfloat16),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def gather_3d():
    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=2)

    x = jnp.asarray(np.random.rand(4, 16, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 128, (4, 16, 128)), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((4, 16, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def cross_tile_gather():
    """Gather with indices addressing beyond one (8, 128) f32 tile's lanes
    is fine; the probe here is sublane-axis gather (axis 0)."""

    def kernel(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    x = jnp.asarray(np.random.rand(64, 128), jnp.float32)
    idx = jnp.asarray(np.random.randint(0, 64, (64, 128)), jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((64, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, idx)


def dynamic_roll():
    def kernel(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], shift=s_ref[0], axis=1)

    x = jnp.asarray(np.random.rand(16, 128), jnp.float32)
    s = jnp.asarray([5], jnp.int32)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((16, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, s)


def main():
    print(f"backend: {jax.default_backend()}, jax {jax.__version__}")
    results = {
        "bf16 lane gather": probe("bf16 lane gather", bf16_gather),
        "3-D gather": probe("3-D gather", gather_3d),
        "sublane-axis gather": probe("sublane-axis gather", cross_tile_gather),
        "dynamic lane roll": probe("dynamic lane roll", dynamic_roll),
    }
    if results["bf16 lane gather"]:
        print("\n-> bf16 gathers LANDED: re-bench DCN with bf16 x-staging "
              "(ROUND2_NOTES #1 retry condition met).")
    if results["3-D gather"]:
        print("-> 3-D gathers LANDED: v6/v7 row-stacked kernels viable.")


if __name__ == "__main__":
    main()
