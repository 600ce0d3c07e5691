"""End-to-end input-pipeline throughput: jpeg decode -> aug -> crop (host or
device mode) at realistic frame sizes (VERDICT round-1 weak item 2).

Builds a synthetic PoseTrack-shaped dataset of 720p jpegs, then measures the
DataLoader's steady-state batches/s at the training batch size, and the
data-time fraction against a given train-step time.

Run: python tools/bench_input_pipeline.py [--frames 720 1280] [--batch 8]
     [--workers 8] [--step-ms 556] [--device-crop]
"""

import argparse
import json
import os
import os.path as osp
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def make_fixture(root, n_videos, n_frames, hw, people=2, seed=0):
    rng = np.random.RandomState(seed)
    h, w = hw
    img_dir = osp.join(root, "images")
    images, annotations = [], []
    img_id = ann_id = 0
    for v in range(n_videos):
        vdir = osp.join(img_dir, f"video_{v:04d}")
        os.makedirs(vdir, exist_ok=True)
        centers = rng.uniform([150, 150], [w - 150, h - 150], size=(people, 2))
        for f in range(n_frames):
            fname = f"{f + 1:08d}.jpg"
            img = rng.randint(0, 255, (h, w, 3), np.uint8)
            cv2.imwrite(osp.join(vdir, fname), img)
            img_id += 1
            images.append({
                "id": img_id, "file_name": f"video_{v:04d}/{fname}",
                "width": w, "height": h, "nframes": n_frames,
                "frame_id": f + 1, "vid_id": f"video_{v:04d}",
                "is_labeled": True,
            })
            for p in range(people):
                cx, cy = centers[p]
                pts = np.stack([
                    cx + rng.randn(17) * 40, cy + rng.randn(17) * 80
                ], 1)
                kps = []
                for x, y in pts:
                    kps += [float(x), float(y), 1]
                x0, y0 = pts.min(0) - 10
                x1, y1 = pts.max(0) + 10
                ann_id += 1
                annotations.append({
                    "id": ann_id, "image_id": img_id, "category_id": 1,
                    "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                    "area": float((x1 - x0) * (y1 - y0)), "iscrowd": 0,
                    "keypoints": kps, "track_id": p,
                    "bbox_head": [float(x0), float(y0), 30.0, 30.0],
                    "scores": [],
                })
    os.makedirs(osp.join(root, "json"), exist_ok=True)
    payload = {"images": images, "annotations": annotations,
               "categories": [{"id": 1, "name": "person"}]}
    for name in ("posetrack_train.json", "posetrack_val.json"):
        with open(osp.join(root, "json", name), "w") as fh:
            json.dump(payload, fh)
    return osp.join(root, "json"), img_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, nargs=2, default=[720, 1280])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--videos", type=int, default=4)
    ap.add_argument("--nframes", type=int, default=16)
    ap.add_argument("--step-ms", type=float, default=556.0,
                    help="train-step time to compute the data-time fraction")
    ap.add_argument("--device-crop", action="store_true")
    args = ap.parse_args()

    from fami_pose_tpu.data.loader import DataLoader
    from fami_pose_tpu.data.posetrack import PoseTrackDataset
    from fami_pose_tpu.config import get_default_cfg

    with tempfile.TemporaryDirectory() as root:
        json_dir, img_dir = make_fixture(
            root, args.videos, args.nframes, tuple(args.frames)
        )
        cfg = get_default_cfg()
        cfg.DISTANCE = 3
        cfg.MODEL.NUM_JOINTS = 17
        cfg.MODEL.IMAGE_SIZE = [288, 384]
        cfg.MODEL.HEATMAP_SIZE = [72, 96]
        cfg.DATASET.JSON_DIR = json_dir
        cfg.DATASET.IMG_DIR = img_dir
        cfg.DATASET.IS_POSETRACK18 = False
        cfg.DATASET.COLOR_RGB = True
        cfg.DATASET.BBOX_ENLARGE_FACTOR = 1.25
        cfg.TRAIN.PROB_HALF_BODY = 0.0
        cfg.WORKERS = args.workers
        if args.device_crop:
            cfg.TPU.DEVICE_CROP = True

        ds = PoseTrackDataset(cfg, "train")
        loader = DataLoader(
            ds, batch_size=args.batch, shuffle=True,
            num_workers=args.workers, drop_last=True,
        )
        # one warm epoch fragment (thread pool spin-up, page cache)
        it = iter(loader)
        next(it)
        t0 = time.perf_counter()
        n = 0
        for batch in it:
            n += 1
        dt = time.perf_counter() - t0
        per_batch_ms = dt / n * 1e3
        clips_s = n * args.batch / dt
        frac = per_batch_ms / (per_batch_ms + args.step_ms)
        mode = "device-crop" if args.device_crop else "host-crop"
        print(json.dumps({
            "mode": mode, "frame_hw": args.frames, "batch": args.batch,
            "workers": args.workers, "batches_timed": n,
            "ms_per_batch": round(per_batch_ms, 1),
            "clips_per_sec_host": round(clips_s, 1),
            "data_fraction_vs_step": round(frac, 4),
            "overlapped_data_time_fraction": round(
                max(0.0, (per_batch_ms - args.step_ms) / per_batch_ms), 4
            ),
        }))


if __name__ == "__main__":
    main()
