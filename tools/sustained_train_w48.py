"""W48 on-chip sustained training run with mid-run resume (VERDICT r2 #5).

Runs the FLAGSHIP model (HRNet-W48 backbone, bf16, remat, Pallas DCN)
through the real Trainer on the synthetic fixture (joint markers drawn, no
augmentation -> overfittable), in two phases with a simulated preemption at
a checkpoint boundary:

  phase 1: epochs [0, N/2)   -> checkpoints under out/ckpt
  phase 2: fresh Trainer, AUTO_RESUME -> must resume BITWISE and continue
           to epoch N; the PCK meter must end > 0.9 on the overfit set.

Output: summary + metrics stream stats, recorded in
docs/SUSTAINED_TRAIN_W48.md. Run: python tools/sustained_train_w48.py
[--epochs 150] (2 steps/epoch at batch 8 on the 16-sample fixture).
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

import jax
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--image-size", type=int, nargs=2, default=[96, 128],
                   help="(w, h) crop size; divisible by 32")
    p.add_argument("--motion", default=None, choices=[None, "drift", "articulated"],
                   help="fixture motion model; 'drift' gives each person a "
                        "rigid pose translating at ~8 px/frame (the "
                        "checkpoint for tools/streaming_ab.py "
                        "--motion drift)")
    p.add_argument("--occlude", type=float, default=0.0,
                   help="per-(person,frame) probability of hiding the joint "
                        "markers: occluded keyframes make temporal "
                        "alignment load-bearing, so the trained DCN offsets "
                        "become non-trivial (docs/DCN_OFFSET_BOUND.md)")
    p.add_argument("--flip", action="store_true",
                   help="train WITH flip augmentation (TRAIN.FLIP, the "
                        "reference default) — required for a flip A/B with "
                        "resolving power: a no-flip-trained checkpoint "
                        "understates the flipped branch (tools/flip_ab.py)")
    args = p.parse_args()

    from fixtures import make_cfg, make_posetrack_fixture

    from fami_pose_tpu.engine.trainer import Trainer
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    root = tempfile.mkdtemp(prefix="w48_sustain_")
    _, img_dir = make_posetrack_fixture(
        root, n_videos=2, n_frames=5, people_per_frame=2, seed=3,
        draw_joints=True, motion=args.motion, occlude=args.occlude,
    )
    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = W48_EXTRA
    w, h = args.image_size
    cfg.MODEL.IMAGE_SIZE = [w, h]
    cfg.MODEL.HEATMAP_SIZE = [w // 4, h // 4]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.REMAT_BACKBONE = True
    cfg.TPU.DCN_MAX_OFFSET = 4
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.TRAIN.BATCH_SIZE_PER_GPU = 8
    cfg.TRAIN.AUTO_RESUME = True
    cfg.TRAIN.SHUFFLE = True
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.LR_STEP = [10000]
    cfg.TRAIN.SCALE_FACTOR = [0.0, 0.0]
    cfg.TRAIN.ROT_FACTOR = 0
    cfg.TRAIN.FLIP = bool(args.flip)
    cfg.DATASET.RANDOM_AUX_FRAME = False
    cfg.PRINT_FREQ = 1
    cfg.OUTPUT_DIR = osp.join(root, "out")
    dirs = {"checkpoints": osp.join(root, "ckpt"),
            "log": osp.join(root, "log")}

    half = args.epochs // 2

    print(f"fixture + outputs under {root} "
          f"(checkpoints: {dirs['checkpoints']})", flush=True)

    cfg1 = cfg.clone()
    cfg1.TRAIN.END_EPOCH = half
    t1 = Trainer(cfg1, output_dirs=dirs)
    spe = t1.steps_per_epoch
    print(f"phase 1: {half} epochs x {spe} steps", flush=True)
    state1 = t1.train()
    t1.writer.close()
    leaves1 = jax.tree.leaves(
        {"p": state1.params, "b": state1.batch_stats, "o": state1.opt_state}
    )
    step1 = int(state1.step)

    cfg2 = cfg.clone()
    cfg2.TRAIN.END_EPOCH = args.epochs
    t2 = Trainer(cfg2, output_dirs=dirs)
    assert t2.begin_epoch == half, (t2.begin_epoch, half)
    assert int(t2.state.step) == step1
    leaves2 = jax.tree.leaves(
        {"p": t2.state.params, "b": t2.state.batch_stats,
         "o": t2.state.opt_state}
    )
    mismatch = sum(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves1, leaves2)
    )
    print(f"resume at epoch {half}: step={step1}, "
          f"{len(leaves1)} state leaves, {mismatch} mismatched (must be 0)",
          flush=True)
    assert mismatch == 0
    t2.train()
    t2.writer.close()

    recs = [json.loads(l) for l in open(osp.join(dirs["log"], "metrics.jsonl"))]
    loss = [(r["step"], r["value"]) for r in recs if r["tag"] == "train_loss"]
    acc = [(r["step"], r["value"]) for r in recs if r["tag"] == "train_acc"]
    first5l = np.mean([v for _, v in loss[:5]])
    last5l = np.mean([v for _, v in loss[-5:]])
    last5a = np.mean([v for _, v in acc[-5:]])
    gaps = np.diff(sorted({s for s, _ in loss}))
    print(f"\nsteps: {args.epochs * spe} total, resume at {step1}")
    print(f"loss: {first5l:.5f} -> {last5l:.5f} "
          f"(ratio {last5l / first5l:.3f})")
    print(f"final PCK (train meter, last 5 logs): {last5a:.3f}")
    print(f"max log-step gap: {gaps.max()} (continuous <= {spe})")
    status = "PASS" if (last5a > 0.9 and mismatch == 0) else "FAIL"
    print(f"{status}: overfit PCK {'>' if last5a > 0.9 else '<='} 0.9, "
          f"bitwise resume continuity {'ok' if mismatch == 0 else 'BROKEN'}")


if __name__ == "__main__":
    main()
