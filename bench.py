"""Benchmark: FAMIPose (HRNet-W48, 4 sup frames) clips/sec on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "clips/sec/chip", "vs_baseline": N}

The baseline is the driver-set north star of 500 clips/sec/chip at 384x288
(BASELINE.json). A "clip" is one key frame + 4 supporting frames through the
full model (shared backbone pass over 5 frames + alignment head + decode-ready
heatmaps), i.e. the eval-path forward of the flagship config
(configs/Alignment/posetrack17 equivalent).

Env knobs: BENCH_BATCH (default 128), BENCH_ITERS (default 20), BENCH_DTYPE
(bfloat16|float32).
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: first-run Mosaic/XLA compiles through the axon
# relay are slow; cached binaries make repeat runs fast
_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.makedirs(_CACHE, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_CLIPS_PER_SEC = 500.0


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    dtype = (
        jnp.float32
        if os.environ.get("BENCH_DTYPE", "bfloat16") == "float32"
        else jnp.bfloat16
    )

    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    max_off = int(os.environ.get("BENCH_DCN_MAX_OFFSET", "4"))
    model = FAMIPose(
        extra=W48_EXTRA, num_joints=17, dtype=dtype,
        dcn_max_offset=max_off, use_pallas_dcn=use_pallas,
    )
    h, w, n_sup = 384, 288, 4
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(batch, h, w, 3 * n_sup), jnp.float32)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1], train=False)
    )()

    def forward(v, kf_x, sup_x):
        final, _ = model.apply(v, kf_x, sup_x, train=False)
        return final.astype(jnp.float32)

    @jax.jit
    def timed_loop(v, kf_x, sup_x):
        # chain iterations through a data dependency so the measured time
        # covers `iters` sequential forwards (async dispatch can otherwise
        # under-report)
        def body(carry, _):
            out = forward(v, kf_x + carry, sup_x)
            s = jnp.sum(out)
            # tiny but *data-dependent* carry: prevents XLA from hoisting
            # the forward out of the loop (a literal *0 would constant-fold,
            # and scaling the raw sum can overflow at random init)
            return jnp.sign(s) * jnp.float32(1e-6), s
        _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return sums

    # warmup / compile (fetch to host: on relayed platforms
    # block_until_ready alone does not guarantee execution finished)
    np.asarray(timed_loop(variables, kf, sup))

    t0 = time.perf_counter()
    sums = np.asarray(timed_loop(variables, kf, sup))
    dt = time.perf_counter() - t0
    assert np.isfinite(sums).all()

    clips_per_sec = batch * iters / dt
    print(
        json.dumps(
            {
                "metric": "fami_pose_w48_384x288_eval_forward",
                "value": round(clips_per_sec, 2),
                "unit": "clips/sec/chip",
                "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
