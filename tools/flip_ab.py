"""Flip-test A/B on trained weights: AP contribution vs 2x forward cost.

BASELINE config 3 (flip-test + heatmap averaging + fused decode) is the
serving mode whose throughput sits at ~0.5x of the no-flip path — the
flipped second forward is inherently a full extra forward (a CNN is not
reflection-equivariant, so no weight transform avoids it; reference
flip-test: ``VAL.FLIP`` + ``flip_back``,
``datasets/process/pose_process.py:25-44`` and eval loop
``alignment_mi_function_term6_1.py:264-290``). The only honest ways to close
the config-3 gap are (a) measure that flip-test's AP value is negligible and
bless a no-flip serving default, or (b) eat the 2x. This tool measures (a)
on TRAINED weights through the full protocol:

  * evaluates the same checkpoint twice on the sustained-run fixture
    (identical regeneration: seed 3, joint markers) — VAL.FLIP_VAL off/on —
    and reports per-joint AP for both + the delta;
  * times the two eval forwards (clips/s) for the cost side.

CAVEAT (recorded with the results): the sustained-training checkpoint was
trained WITHOUT flip augmentation on marker images, which understates the
flipped branch's quality vs a real PoseTrack checkpoint (trained with flip
aug). The decision gate for production remains a PoseTrack-trained
checkpoint; this closes the evidence gap the fixture can close.

Run: python tools/flip_ab.py --ckpt /path/epoch_149_state.ckpt
"""

import argparse
import os
import os.path as osp
import sys
import tempfile
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

import jax

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True,
                   help="trained checkpoint (tools/sustained_train_w48.py)")
    p.add_argument("--int8", action="store_true",
                   help="also run the int8 serving backbone variant")
    p.add_argument("--motion", default=None,
                   choices=[None, "drift", "articulated"],
                   help="fixture motion model — MUST match the one the "
                        "checkpoint was trained with")
    p.add_argument("--occlude", type=float, default=0.0,
                   help="fixture occlusion rate — MUST match training")
    args = p.parse_args()

    from fixtures import make_cfg, make_posetrack_fixture
    from test_end_to_end import _write_gt_annolists

    from fami_pose_tpu.engine.evaluator import Evaluator
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    root = tempfile.mkdtemp(prefix="flip_ab_")
    _, img_dir = make_posetrack_fixture(
        root, n_videos=2, n_frames=5, people_per_frame=2, seed=3,
        draw_joints=True, motion=args.motion, occlude=args.occlude,
    )
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = W48_EXTRA
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.DCN_MAX_OFFSET = 4
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.VAL.BATCH_SIZE_PER_GPU = 4
    cfg.VAL.USE_GT_BBOX = True
    cfg.VAL.POST_PROCESS = True
    cfg.OUTPUT_DIR = osp.join(root, "out")
    cfg.VAL.ANNOT_DIR = _write_gt_annolists(root, img_dir, cfg)

    results, timings = {}, {}
    modes = [("noflip", False), ("flip", True)]
    if args.int8:
        modes += [("noflip_int8", False), ("flip_int8", True)]
    variables = None
    for tag, flip in modes:
        c = cfg.clone()
        c.VAL.FLIP_VAL = flip
        if tag.endswith("_int8"):
            c.TPU.INT8_EVAL = True
        ev = Evaluator(c)
        if variables is None:
            variables = ev.load_variables(args.ckpt)
            print(f"loaded {args.ckpt}")
        t0 = time.time()
        res = ev.eval_checkpoint(dict(variables))
        timings[tag] = time.time() - t0
        results[tag] = dict(res["final"][0])
        print(f"[{tag}] ({timings[tag]:.1f}s) " + ", ".join(
            f"{k}={v:.2f}" for k, v in results[tag].items()))

    print("\n== flip-test AP delta (flip - noflip), trained weights ==")
    for base, fl in (("noflip", "flip"),) + (
        (("noflip_int8", "flip_int8"),) if args.int8 else ()
    ):
        deltas = {k: results[fl][k] - results[base][k] for k in results[base]}
        print(f"{fl}-{base}: " + ", ".join(
            f"{k}={v:+.3f}" for k, v in deltas.items()))
    print("\n(eval wall time includes decode+protocol; the forward-only "
          "cost ratio is measured by bench.py's flip modes)")


if __name__ == "__main__":
    main()
