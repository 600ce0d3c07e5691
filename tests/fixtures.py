"""Synthetic PoseTrack-style dataset fixture: tiny videos + COCO json."""

import json
import os
import os.path as osp

import cv2
import numpy as np

IMG_W, IMG_H = 128, 96


def _person(rng, cx, cy):
    """17 COCO keypoints around a center, all visible."""
    base = np.array([cx, cy], np.float32)
    offs = rng.uniform(-18, 18, size=(17, 2)).astype(np.float32)
    pts = base + offs
    pts[:, 0] = np.clip(pts[:, 0], 2, IMG_W - 3)
    pts[:, 1] = np.clip(pts[:, 1], 2, IMG_H - 3)
    return pts


def make_posetrack_fixture(
    root, n_videos=2, n_frames=5, people_per_frame=2, posetrack18=False,
    seed=0, draw_joints=False, motion=None, occlude=0.0,
):
    """Write images + a COCO-style json; returns (json_path, img_dir).

    PT18 naming: 6-digit frames starting at 0; PT17: 8-digit starting at 1.

    ``draw_joints`` paints a distinct-colored disc at every keypoint so the
    image->pose mapping is learnable from LOCAL features (convergence tests)
    instead of pure noise memorization.

    ``motion``: None (default, bitwise-stable RNG stream — existing trained
    checkpoints regenerate their fixture exactly) keeps each person's center
    FIXED across frames with i.i.d. per-frame keypoint jitter — support
    frames carry NO information about the keyframe pose, so a trained
    aligner learns ~zero offsets and box motion is stationary jitter (the
    degenerate case for box-motion policies). ``"drift"`` gives each person
    a RIGID pose (skeleton offsets drawn once) translating at a constant
    per-person velocity (~8 px/frame): support frames show the keyframe
    pose displaced by k*velocity, so temporal alignment is well-posed —
    the realistic scenario both the streaming re-prime trigger and the
    DCN offset window exist for.

    ``occlude``: probability (per person, per frame) that the joint markers
    are NOT drawn (needs ``draw_joints``). Occluded keyframes force the
    model to recover the pose from neighboring frames — this is what makes
    a trained aligner produce genuinely LARGE offsets (FAMI-Pose's raison
    d'etre, reference Alignment_V15); without it the keyframe alone
    suffices and offsets collapse to ~0 (measured in
    docs/DCN_OFFSET_BOUND.md). Annotations always keep the true keypoints.

    ``"articulated"``: like drift, but each JOINT additionally moves with
    its own constant velocity (±6 px/frame) — NON-RIGID motion the global
    translation warp cannot absorb, so recovering occluded keyframes
    requires per-location DEFORMABLE offsets (~±1.5 feature px per frame
    of temporal distance at stride 4). Measured necessity: with rigid
    drift the global-alignment stage absorbs all motion and the trained
    DCN offsets stay ~0 (docs/DCN_OFFSET_BOUND.md r4).
    """
    rng = np.random.RandomState(seed)
    img_dir = osp.join(root, "images")
    zero_fill = 6 if posetrack18 else 8
    start = 0 if posetrack18 else 1

    images, annotations = [], []
    img_id, ann_id = 0, 0
    for v in range(n_videos):
        vid_name = f"video_{v:04d}"
        vdir = osp.join(img_dir, vid_name)
        os.makedirs(vdir, exist_ok=True)
        centers0 = rng.uniform([30, 30], [IMG_W - 30, IMG_H - 30],
                               size=(people_per_frame, 2))
        if motion in ("drift", "articulated"):
            # drawn AFTER centers so motion=None's stream is untouched
            ang = rng.uniform(0, 2 * np.pi, size=people_per_frame)
            speed = rng.uniform(6.0, 10.0, size=people_per_frame)
            vel = np.stack([np.cos(ang), np.sin(ang)], -1) * speed[:, None]
            rigid_offs = rng.uniform(
                -18, 18, size=(people_per_frame, 17, 2)
            ).astype(np.float32)
            joint_vel = (
                rng.uniform(-6.0, 6.0, size=(people_per_frame, 17, 2))
                .astype(np.float32)
                if motion == "articulated"
                else np.zeros((people_per_frame, 17, 2), np.float32)
            )
            # ONE background per video: a per-frame noise background would
            # identify the frame and let an overfit model memorize occluded
            # keyframes' poses instead of aligning from support frames
            video_bg = rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
        elif motion is not None:
            raise ValueError(f"unknown motion model {motion!r}")
        moving = motion in ("drift", "articulated")
        for f in range(n_frames):
            if moving:
                centers = np.clip(
                    centers0 + f * vel, [24, 24], [IMG_W - 24, IMG_H - 24]
                )
            else:
                centers = centers0
            frame_idx = start + f
            fname = f"{str(frame_idx).zfill(zero_fill)}.jpg"
            img = (
                video_bg.copy() if moving
                else rng.randint(0, 255, (IMG_H, IMG_W, 3), np.uint8)
            )
            if moving:
                frame_pts = []
                for p in range(people_per_frame):
                    pts = (
                        centers[p].astype(np.float32) + rigid_offs[p]
                        + f * joint_vel[p]
                    )
                    pts[:, 0] = np.clip(pts[:, 0], 2, IMG_W - 3)
                    pts[:, 1] = np.clip(pts[:, 1], 2, IMG_H - 3)
                    frame_pts.append(pts)
            else:
                frame_pts = [_person(rng, *centers[p])
                             for p in range(people_per_frame)]
            if draw_joints:
                for pts in frame_pts:
                    if occlude > 0.0 and rng.rand() < occlude:
                        continue  # markers hidden this frame (GT unchanged)
                    for j, (x, y) in enumerate(pts):
                        color = (
                            int(40 + 12 * j), int(255 - 12 * j),
                            int(128 + 7 * j) % 256,
                        )
                        cv2.circle(
                            img, (int(round(x)), int(round(y))), 3, color, -1
                        )
            cv2.imwrite(osp.join(vdir, fname), img)
            img_id += 1
            images.append(
                {
                    "id": img_id,
                    "file_name": f"{vid_name}/{fname}",
                    "width": IMG_W,
                    "height": IMG_H,
                    "nframes": n_frames,
                    "frame_id": frame_idx,
                    "vid_id": vid_name,
                    "is_labeled": True,
                }
            )
            for p in range(people_per_frame):
                pts = frame_pts[p]
                kps = []
                for x, y in pts:
                    kps += [float(x), float(y), 1]
                x0, y0 = pts.min(0) - 4
                x1, y1 = pts.max(0) + 4
                ann_id += 1
                annotations.append(
                    {
                        "id": ann_id,
                        "image_id": img_id,
                        "category_id": 1,
                        "bbox": [float(x0), float(y0), float(x1 - x0), float(y1 - y0)],
                        "area": float((x1 - x0) * (y1 - y0)),
                        "iscrowd": 0,
                        "keypoints": kps,
                        "track_id": p,
                        "bbox_head": [float(x0), float(y0), 20.0, 20.0],
                        "scores": [],
                    }
                )

    dataset = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 1, "name": "person"}],
    }
    os.makedirs(osp.join(root, "json"), exist_ok=True)
    json_path = osp.join(root, "json", "posetrack_train.json")
    with open(json_path, "w") as fh:
        json.dump(dataset, fh)
    # same content serves as the val index
    val_path = osp.join(root, "json", "posetrack_val.json")
    with open(val_path, "w") as fh:
        json.dump(dataset, fh)
    return json_path, img_dir


def make_cfg(json_dir, img_dir, posetrack18=False, distance=3):
    from fami_pose_tpu.config import get_default_cfg

    cfg = get_default_cfg()
    cfg.DISTANCE = distance
    cfg.MODEL.NUM_JOINTS = 17
    cfg.MODEL.IMAGE_SIZE = [96, 128]  # (w, h): divisible by 32 at 1/4
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.MODEL.SIGMA = 2
    cfg.DATASET.NAME = "PoseTrack"
    cfg.DATASET.JSON_DIR = json_dir
    cfg.DATASET.IMG_DIR = img_dir
    cfg.DATASET.TEST_IMG_DIR = img_dir
    cfg.DATASET.IS_POSETRACK18 = posetrack18
    cfg.DATASET.COLOR_RGB = True
    cfg.DATASET.BBOX_ENLARGE_FACTOR = 1.25
    cfg.TRAIN.PROB_HALF_BODY = 0.0
    cfg.VAL.USE_GT_BBOX = True
    cfg.WORKERS = 1
    return cfg
