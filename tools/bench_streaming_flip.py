"""A/B the streaming flip-test step: paired (two B-sized backbone/head
calls) vs batched (one 2B call) — see engine/streaming.py ``flip_batched``.

Usage (on the TPU):  python tools/bench_streaming_flip.py
Env: BENCH_BATCH (128), BENCH_ITERS (20), BENCH_INT8 (1), BENCH_D (1).
"""

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
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    int8 = os.environ.get("BENCH_INT8", "1") == "1"
    d = int(os.environ.get("BENCH_D", "1"))

    from fami_pose_tpu.engine.streaming import init_state, make_step
    from fami_pose_tpu.models.fami_pose import FAMIPose
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    model = FAMIPose(
        extra=W48_EXTRA, num_joints=17, dtype=jnp.bfloat16,
        dcn_max_offset=d, use_pallas_dcn=True,
        backbone_quant="int8" if int8 else "off",
    )
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.rand(batch, 384, 288, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(8, 384, 288, 12), jnp.float32)
    v = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1],
                           train=False)
    )()
    if int8:
        from fami_pose_tpu.models.quant import calibrate

        v = dict(v)
        v["quant"] = jax.jit(
            lambda vv, a, b: calibrate(
                model.clone(backbone_quant="calibrate"), vv, [(a, b)],
                train=False,
            )
        )(v, kf[:8], sup)

    def measure(flip_batched):
        step = make_step(model, v, distance=3, flip_test=True,
                         flip_batched=flip_batched)
        state0 = jax.jit(
            lambda f: init_state(model, v, f, 3, flip_test=True)
        )(kf)

        @jax.jit
        def loop(state, f):
            def body(carry, _):
                st, c = carry
                st, (hm, _) = step(st, f + c)
                s = jnp.sum(hm.astype(jnp.float32))
                return (st, jnp.sign(s) * jnp.float32(1e-6)), s
            (_, _), sums = jax.lax.scan(
                body, (state, jnp.float32(0.0)), None, length=iters
            )
            return sums

        np.asarray(loop(state0, kf))
        t0 = time.perf_counter()
        sums = np.asarray(loop(state0, kf))
        dt = time.perf_counter() - t0
        assert np.isfinite(sums).all()
        return round(batch * iters / dt, 2)

    paired = measure(False)
    batched = measure(True)
    print({"paired_clips_per_sec": paired, "batched_clips_per_sec": batched,
           "batch": batch, "int8": int8, "d": d})


if __name__ == "__main__":
    main()
