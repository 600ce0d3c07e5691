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
    int8 = os.environ.get("BENCH_INT8", "0") == "1"
    model = FAMIPose(
        extra=W48_EXTRA, num_joints=17, dtype=dtype,
        dcn_max_offset=max_off, use_pallas_dcn=use_pallas,
        backbone_quant="int8" if int8 else "off",
    )
    h, w, n_sup = 384, 288, 4
    rng = np.random.RandomState(0)
    kf = jnp.asarray(rng.rand(batch, h, w, 3), jnp.float32)
    sup = jnp.asarray(rng.rand(batch, h, w, 3 * n_sup), jnp.float32)

    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), kf[:1], sup[:1], train=False)
    )()
    if int8:
        # PTQ calibration on one (synthetic) batch — serving would calibrate
        # on real eval batches via the evaluator (TPU.INT8_EVAL)
        from fami_pose_tpu.models.quant import calibrate

        variables = dict(variables)
        variables["quant"] = jax.jit(
            lambda v, a, b: calibrate(
                model.clone(backbone_quant="calibrate"), v, [(a, b)],
                train=False,
            )
        )(variables, kf[:8], sup[:8])

    def forward(v, kf_x, sup_x):
        final, _ = model.apply(v, kf_x, sup_x, train=False)
        return final.astype(jnp.float32)

    # serving pipeline (BASELINE.json config 3): flip-test + heatmap
    # averaging + DARK sub-pixel decode + on-device OKS-NMS, all inside one
    # jit — the full path from crops to final keypoints
    from fami_pose_tpu.data.keypoints import COCO_FLIP_PAIRS
    from fami_pose_tpu.ops.heatmap import dark_get_final_preds
    from fami_pose_tpu.ops.nms import oks_nms_device
    from fami_pose_tpu.ops.pose import flip_back_nhwc

    center = jnp.tile(jnp.asarray([[144.0, 192.0]], jnp.float32), (batch, 1))
    scale = jnp.tile(jnp.asarray([[1.44, 1.92]], jnp.float32), (batch, 1))

    def pipeline(v, kf_x, sup_x):
        final, _ = model.apply(v, kf_x, sup_x, train=False)
        f_final, _ = model.apply(
            v, kf_x[:, :, ::-1, :], sup_x[:, :, ::-1, :], train=False
        )
        final = (final + flip_back_nhwc(f_final, COCO_FLIP_PAIRS)) * 0.5
        hm = jnp.transpose(final.astype(jnp.float32), (0, 3, 1, 2))
        preds, maxvals = dark_get_final_preds(hm, center, scale)
        kpts = jnp.concatenate([preds, maxvals], axis=-1)  # (B, J, 3)
        scores = jnp.mean(maxvals[..., 0], axis=-1)
        areas = jnp.prod(scale * 200.0, axis=-1)
        keep = oks_nms_device(
            kpts, scores, areas, jnp.ones((batch,), bool), thr=0.9
        )
        return kpts * keep[:, None, None].astype(jnp.float32)

    def make_loop(fn):
        @jax.jit
        def timed_loop(v, kf_x, sup_x):
            # chain iterations through a data dependency so the measured time
            # covers `iters` sequential forwards (async dispatch can otherwise
            # under-report)
            def body(carry, _):
                out = fn(v, kf_x + carry, sup_x)
                s = jnp.sum(out)
                # tiny but *data-dependent* carry: prevents XLA from hoisting
                # the forward out of the loop (a literal *0 would
                # constant-fold, and scaling the raw sum can overflow)
                return jnp.sign(s) * jnp.float32(1e-6), s
            _, sums = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return sums
        return timed_loop

    def measure(fn):
        loop = make_loop(fn)
        # warmup / compile (fetch to host: on relayed platforms
        # block_until_ready alone does not guarantee execution finished)
        np.asarray(loop(variables, kf, sup))
        t0 = time.perf_counter()
        sums = np.asarray(loop(variables, kf, sup))
        dt = time.perf_counter() - t0
        assert np.isfinite(sums).all()
        return batch * iters / dt

    clips_per_sec = measure(forward)
    record = {
        "metric": "fami_pose_w48_384x288_eval_forward"
        + ("_int8" if int8 else ""),
        "value": round(clips_per_sec, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": round(clips_per_sec / BASELINE_CLIPS_PER_SEC, 4),
    }
    if os.environ.get("BENCH_PIPELINE", "1") == "1":
        # full serving path: the number BASELINE.json's north star describes
        record["pipeline_clips_per_sec"] = round(measure(pipeline), 2)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
