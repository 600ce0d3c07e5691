"""Resume a tools/sustained_train_w48.py run in an EXISTING fixture root.

sustained_train_w48.py makes a fresh tempdir fixture per invocation; when a
long run is interrupted (session timeout, preemption) the fixture + epoch
checkpoints survive under the printed root. This tool rebuilds the same cfg
against that root and lets AUTO_RESUME continue from the latest checkpoint
to --epochs. The cfg knobs MUST match the original run (they are the same
defaults sustained_train_w48.py sets; pass the same --motion/--occlude/
--flip/--image-size).

Run: python tools/resume_train_w48.py --root /tmp/w48_sustain_XXXX \
         --motion drift --occlude 0.4 --flip --epochs 150
"""

import argparse
import json
import os
import os.path as osp
import sys

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

import jax
import numpy as np

_CACHE = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", required=True,
                   help="the fixture root a previous sustained_train_w48.py "
                        "run printed (contains json/ images/ ckpt/ log/)")
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--image-size", type=int, nargs=2, default=[96, 128])
    p.add_argument("--motion", default=None,
                   choices=[None, "drift", "articulated"])
    p.add_argument("--occlude", type=float, default=0.0)
    p.add_argument("--flip", action="store_true")
    args = p.parse_args()

    from fixtures import make_cfg

    from fami_pose_tpu.engine.trainer import Trainer
    from fami_pose_tpu.models.hrnet import W48_EXTRA

    root = args.root
    img_dir = osp.join(root, "images")
    assert osp.isdir(img_dir) and osp.isdir(osp.join(root, "json")), root
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
    cfg.TRAIN.END_EPOCH = args.epochs
    dirs = {"checkpoints": osp.join(root, "ckpt"),
            "log": osp.join(root, "log")}

    t = Trainer(cfg, output_dirs=dirs)
    print(f"resuming at epoch {t.begin_epoch} (step {int(t.state.step)}) "
          f"-> {args.epochs}", flush=True)
    t.train()
    t.writer.close()

    recs = [json.loads(l)
            for l in open(osp.join(dirs["log"], "metrics.jsonl"))]
    acc = [r["value"] for r in recs if r["tag"] == "train_acc"]
    loss = [r["value"] for r in recs if r["tag"] == "train_loss"]
    print(f"final PCK (train meter, last 5 logs): {np.mean(acc[-5:]):.3f}")
    print(f"final loss (last 5 logs): {np.mean(loss[-5:]):.5f}")


if __name__ == "__main__":
    main()
