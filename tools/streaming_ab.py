"""Trained-weights A/B: batch protocol vs crop-locked streaming serving.

The streaming path (engine/streaming.py) reuses per-frame backbone features
across sliding windows, which is exact only while the person crop is held
fixed ("crop-locked"). The reference batch protocol instead re-crops every
window frame with the KEY frame's box (``PoseTrack_Alignment.py:311-359``),
so the two disagree exactly as much as the boxes move. This tool quantifies
that end-to-end on TRAINED weights (the W48 sustained-training checkpoint,
PCK 0.994 on the fixture — docs/SUSTAINED_TRAIN_W48.md):

  A. batch protocol: per keyframe, crop all window frames with that
     keyframe's box, full forward, DARK decode  -> poseval AP
  B. crop-locked streaming: per (video, track) stream, lock the crop at the
     track's first box, feed frames through the jitted streaming step
     (features computed once per frame), DARK decode with the locked
     affine -> poseval AP

Reported: per-joint AP for both, mean AP delta, and per-keypoint px drift
between matched predictions. Boundary keyframes use the streaming clamp
convention (module docstring) and are included — that is what a server
would actually emit.

Run on the TPU:
  python tools/streaming_ab.py --ckpt /path/epoch_149_state.ckpt
(regenerates the sustained-run fixture bitwise: same seed/args).
"""

import argparse
import os
import os.path as osp
import sys
import tempfile

sys.path.insert(0, osp.join(osp.dirname(__file__), ".."))
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", "tests"))

import cv2
import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_cfg(root, img_dir):
    from fixtures import make_cfg

    from fami_pose_tpu.models.hrnet import W48_EXTRA

    cfg = make_cfg(osp.join(root, "json"), img_dir)
    cfg.MODEL.NAME = "FAMIPose"
    cfg.MODEL.EXTRA = W48_EXTRA
    cfg.MODEL.IMAGE_SIZE = [96, 128]
    cfg.MODEL.HEATMAP_SIZE = [24, 32]
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.DCN_MAX_OFFSET = 4
    cfg.TPU.MESH_SHAPE = [1, 1]
    cfg.VAL.FLIP = False
    cfg.OUTPUT_DIR = osp.join(root, "out")
    return cfg


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--ckpt",
        default="/tmp/w48_sustain_gfzi1lp5/ckpt/epoch_149_state.ckpt",
        help="trained checkpoint (tools/sustained_train_w48.py output)",
    )
    p.add_argument(
        "--reprime-iou", type=float, nargs="*", default=[0.9, 0.7, 0.5],
        help="also serve variant C: crop-locked + automatic box-motion "
             "re-prime (StreamingPosePredictor.maybe_reprime) at each IoU "
             "threshold; reports AP + re-prime rate per threshold",
    )
    p.add_argument(
        "--motion", default=None, choices=[None, "drift", "articulated"],
        help="fixture motion model — must match the one the checkpoint was "
             "trained on (tools/sustained_train_w48.py --motion). None: "
             "stationary centers + i.i.d. keypoint jitter (re-priming to a "
             "recent box cannot beat the first box statistically); drift: "
             "constant per-person velocity, the scenario the re-prime "
             "trigger exists for",
    )
    p.add_argument(
        "--occlude", type=float, default=0.0,
        help="fixture marker-occlusion rate; must match the checkpoint's",
    )
    args = p.parse_args()

    from fixtures import make_posetrack_fixture

    from fami_pose_tpu.data.posetrack import support_frame_paths, read_image
    from fami_pose_tpu.data.video_dataset import normalize_image_uint8
    from fami_pose_tpu.engine.checkpoints import load_variables
    from fami_pose_tpu.engine.streaming import init_state, make_step
    from fami_pose_tpu.models.build import build_model
    from fami_pose_tpu.ops.affine import dark_get_affine_transform
    from fami_pose_tpu.ops.heatmap import dark_get_final_preds
    from fami_pose_tpu.utils.registry import DATASET_REGISTRY, VAL_PHASE

    root = tempfile.mkdtemp(prefix="stream_ab_")
    # identical fixture to the sustained W48 run (seed 3, markers drawn)
    _, img_dir = make_posetrack_fixture(
        root, n_videos=2, n_frames=5, people_per_frame=2, seed=3,
        draw_joints=True, motion=args.motion, occlude=args.occlude,
    )
    cfg = build_cfg(root, img_dir)
    from test_end_to_end import _write_gt_annolists

    cfg.VAL.ANNOT_DIR = _write_gt_annolists(root, img_dir, cfg)
    dataset = DATASET_REGISTRY.get(cfg.DATASET.NAME)(cfg, VAL_PHASE)
    model = build_model(cfg, VAL_PHASE)
    w_in, h_in = int(cfg.MODEL.IMAGE_SIZE[0]), int(cfg.MODEL.IMAGE_SIZE[1])
    num_sup = 2 * (int(cfg.DISTANCE) - 1)
    distance = int(cfg.DISTANCE)

    template = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, h_in, w_in, 3)),
        jnp.zeros((1, h_in, w_in, 3 * num_sup)),
        train=False,
    )
    variables = load_variables(args.ckpt, template)
    print(f"loaded {args.ckpt}")

    db = dataset.data
    n = len(db)
    num_joints = int(cfg.MODEL.NUM_JOINTS)

    def crop(img, center, scale):
        trans = dark_get_affine_transform(
            center, scale, 0.0, cfg.MODEL.IMAGE_SIZE
        )
        out = cv2.warpAffine(
            img, trans, (w_in, h_in), flags=cv2.INTER_LINEAR
        )
        return normalize_image_uint8(out)

    imread = {}

    def frame(path):
        if path not in imread:
            im = read_image(path)
            imread[path] = cv2.cvtColor(im, cv2.COLOR_BGR2RGB)
        return imread[path]

    # ---- A: batch protocol (per-keyframe recrop, full forward) ----------
    fwd = jax.jit(
        lambda v, kf, sup: model.apply(v, kf, sup, train=False)[0].astype(
            jnp.float32
        )
    )
    all_preds_a = np.zeros((n, num_joints, 3), np.float32)
    all_boxes = np.zeros((n, 6), np.float32)
    img_path_map = {}
    kfs, sups = [], []
    for item in db:
        c, s = item["center"], item["scale"]
        kfs.append(crop(frame(item["image"]), c, s))
        sup_paths = support_frame_paths(
            item["image"], item["nframes"], distance
        )
        sups.append(
            np.concatenate(
                [crop(frame(sp), c, s) for sp in sup_paths], axis=-1
            )
        )
    hm_a = fwd(
        variables,
        jnp.asarray(np.stack(kfs), jnp.float32),
        jnp.asarray(np.stack(sups), jnp.float32),
    )
    centers = np.stack([it["center"] for it in db])
    scales = np.stack([it["scale"] for it in db])
    preds, maxvals = dark_get_final_preds(
        jnp.transpose(hm_a, (0, 3, 1, 2)), centers, scales
    )
    all_preds_a[:, :, :2] = np.asarray(preds)
    all_preds_a[:, :, 2:3] = np.asarray(maxvals)
    for i, item in enumerate(db):
        img_path_map.setdefault(item["image"], []).append(i)
        all_boxes[i, 0:2] = item["center"]
        all_boxes[i, 2:4] = item["scale"]
        all_boxes[i, 4] = np.prod(item["scale"] * 200)
        all_boxes[i, 5] = item["score"]

    # ---- B: crop-locked streaming --------------------------------------
    # group db rows into (video, track-slot) streams; fixture tracks are
    # per-frame ann order within a video
    streams = {}
    for i, item in enumerate(db):
        vid = item["video_name"]
        fid = int(item["frame_id"])
        slot = sum(
            1 for j, it2 in enumerate(db[:i])
            if it2["video_name"] == vid and int(it2["frame_id"]) == fid
        )
        streams.setdefault((vid, slot), {})[fid] = i
    keys = sorted(streams)
    b = len(keys)
    lock_c = np.zeros((b, 2), np.float32)
    lock_s = np.zeros((b, 2), np.float32)
    for k, key in enumerate(keys):
        first = db[streams[key][min(streams[key])]]
        lock_c[k] = first["center"]
        lock_s[k] = first["scale"]

    frame_ids = sorted({int(it["frame_id"]) for it in db})
    t_frames = []  # (T, B, H, W, 3) locked crops
    for fid in frame_ids:
        row = []
        for k, key in enumerate(keys):
            vid = key[0]
            any_item = db[streams[key][min(streams[key])]]
            path = osp.join(
                osp.dirname(any_item["image"]),
                str(fid).zfill(len(osp.basename(any_item["image"]) ) - 4)
                + ".jpg",
            )
            row.append(crop(frame(path), lock_c[k], lock_s[k]))
        t_frames.append(np.stack(row))
    t_frames = np.stack(t_frames)

    step = jax.jit(make_step(model, variables, distance))
    state = init_state(
        model, variables, jnp.asarray(t_frames[0], jnp.float32), distance
    )
    all_preds_b = np.zeros((n, num_joints, 3), np.float32)
    emitted = 0
    lat = distance - 1
    total_steps = len(frame_ids) + lat
    for t in range(total_steps):
        f_t = t_frames[min(t, len(frame_ids) - 1)]
        state, (hm, _) = step(state, jnp.asarray(f_t, jnp.float32))
        key_t = t - lat
        if key_t < 0:
            continue
        fid = frame_ids[key_t]
        p_b, m_b = dark_get_final_preds(
            jnp.transpose(hm.astype(jnp.float32), (0, 3, 1, 2)),
            lock_c, lock_s,
        )
        p_b, m_b = np.asarray(p_b), np.asarray(m_b)
        for k, key in enumerate(keys):
            if fid in streams[key]:
                i = streams[key][fid]
                all_preds_b[i, :, :2] = p_b[k]
                all_preds_b[i, :, 2:3] = m_b[k]
                emitted += 1
    assert emitted == n, (emitted, n)

    # ---- C: crop-locked + automatic box-motion re-prime -----------------
    # (StreamingPosePredictor.maybe_reprime; VERDICT r3 #5 — the AP-vs-
    # re-prime-rate curve that turns the crop-locked bench setting into an
    # honest serving default)
    from fami_pose_tpu.engine.streaming import StreamingPosePredictor

    w_buf = 2 * distance - 1

    def frame_path(key, fid):
        any_item = db[streams[key][min(streams[key])]]
        return osp.join(
            osp.dirname(any_item["image"]),
            str(fid).zfill(len(osp.basename(any_item["image"])) - 4)
            + ".jpg",
        )

    def gt_box(key, fid):
        """Current tracker box for this stream (GT box in the fixture)."""
        if fid in streams[key]:
            it = db[streams[key][fid]]
            return it["center"], it["scale"]
        return None

    def run_reprime(thr):
        pred = StreamingPosePredictor(
            model, variables, distance, reprime_iou=thr
        )
        cur_c = lock_c.copy()
        cur_s = lock_s.copy()
        first = np.stack(
            [
                crop(frame(frame_path(key, frame_ids[0])), cur_c[k], cur_s[k])
                for k, key in enumerate(keys)
            ]
        )
        pred.prime(jnp.asarray(first, jnp.float32), cur_c, cur_s)
        preds_c = np.zeros((n, num_joints, 3), np.float32)
        n_reprimed = 0
        for t in range(total_steps):
            fid = frame_ids[min(t, len(frame_ids) - 1)]
            # trigger + re-crop under the box AT THE EMISSION HORIZON (the
            # keyframe about to be emitted, t - lat), not the newest frame:
            # the batch protocol crops every window frame under the
            # KEYFRAME's box, so b_{t-lat} is the crop that reproduces it —
            # re-crop under b_t would pin every emission 2 frames behind
            # its crop (a -lat*velocity systematic offset, measured -23 AP
            # at re-prime rate 0.7 before this fix)
            kf_fid = frame_ids[min(max(t - lat, 0), len(frame_ids) - 1)]
            boxes = [gt_box(key, kf_fid) for key in keys]
            new_c = np.stack(
                [b[0] if b else cur_c[k] for k, b in enumerate(boxes)]
            ).astype(np.float32)
            new_s = np.stack(
                [b[1] if b else cur_s[k] for k, b in enumerate(boxes)]
            ).astype(np.float32)
            mask = pred.boxes_moved(new_c, new_s)
            if mask.any():
                # history: the frames ALREADY FED (steps t-W .. t-1, what
                # the buffer holds before this step; steps < 0 clamp to the
                # prime frame, matching init_state's fill) re-cropped under
                # the NEW boxes. Including step t here would double-feed the
                # current frame and shift every later emission by one.
                hist_fids = [
                    frame_ids[min(max(t - d, 0), len(frame_ids) - 1)]
                    for d in range(w_buf, 0, -1)
                ]
                hist = np.stack(
                    [
                        np.stack(
                            [
                                crop(
                                    frame(frame_path(key, hf)),
                                    new_c[k], new_s[k],
                                )
                                for k, key in enumerate(keys)
                            ]
                        )
                        for hf in hist_fids
                    ]
                )
                pred.maybe_reprime(new_c, new_s, jnp.asarray(hist, jnp.float32))
                cur_c[mask] = new_c[mask]
                cur_s[mask] = new_s[mask]
                n_reprimed += int(mask.sum())
            f_t = np.stack(
                [
                    crop(frame(frame_path(key, fid)), cur_c[k], cur_s[k])
                    for k, key in enumerate(keys)
                ]
            )
            hm, _ = pred(jnp.asarray(f_t, jnp.float32))
            key_t = t - lat
            if key_t < 0:
                continue
            efid = frame_ids[key_t]
            p_c, m_c = dark_get_final_preds(
                jnp.transpose(hm.astype(jnp.float32), (0, 3, 1, 2)),
                cur_c, cur_s,
            )
            p_c, m_c = np.asarray(p_c), np.asarray(m_c)
            for k, key in enumerate(keys):
                if efid in streams[key]:
                    i = streams[key][efid]
                    preds_c[i, :, :2] = p_c[k]
                    preds_c[i, :, 2:3] = m_c[k]
        return preds_c, n_reprimed

    # ---- compare --------------------------------------------------------
    drift = np.linalg.norm(
        all_preds_a[:, :, :2] - all_preds_b[:, :, :2], axis=-1
    )
    print(
        f"\nkeypoint drift batch-vs-streaming (px, original image coords): "
        f"mean {drift.mean():.3f}  p95 {np.percentile(drift, 95):.3f}  "
        f"max {drift.max():.3f}"
    )
    variants = [("batch", all_preds_a, None), ("streaming", all_preds_b, None)]
    for thr in args.reprime_iou or []:
        preds_c, n_rep = run_reprime(thr)
        variants.append((f"reprime@{thr}", preds_c, n_rep))
    res = {}
    total_emissions = n
    for tag, pr, n_rep in variants:
        out_dir = osp.join(root, f"eval_{tag}")
        name_value, mean = dataset.evaluate(
            cfg, pr, out_dir, all_boxes, img_path_map
        )
        res[tag] = dict(name_value)
        extra = (
            f"  (re-primes: {n_rep}, rate {n_rep / total_emissions:.2f}/"
            f"emission)" if n_rep is not None else ""
        )
        print(f"[{tag}] {dict(name_value)}{extra}")
    for tag in res:
        if tag == "batch":
            continue
        deltas = {k: res[tag][k] - res["batch"][k] for k in res["batch"]}
        print(f"AP delta ({tag} - batch): "
              + ", ".join(f"{k}={v:+.2f}" for k, v in deltas.items()))


if __name__ == "__main__":
    main()
