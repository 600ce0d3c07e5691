"""End-to-end demo tool smoke: frames + boxes -> keypoints json (+ overlays).

BASELINE config 4 ("video -> bbox crops -> clip batches -> keypoints",
reference ``tools/demo.sh``), driven through the real CLI entry point.
"""

import json
import os.path as osp
import subprocess
import sys

import cv2
import numpy as np
import pytest

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.mark.slow
def test_demo_cli_end_to_end(tmp_path, rng):
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    for i in range(4):
        img = rng.randint(0, 255, (128, 160, 3), np.uint8)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    boxes = [
        {"frame": i, "bbox": [30.0, 20.0, 80.0, 90.0], "score": 0.9}
        for i in range(4)
    ]
    boxes_path = tmp_path / "boxes.json"
    boxes_path.write_text(json.dumps(boxes))

    # tiny config written on the fly (the demo takes any YAML the runner does)
    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        """
MODEL:
  NAME: FAMIPose
  NUM_JOINTS: 17
  IMAGE_SIZE: [96, 128]
  HEATMAP_SIZE: [24, 32]
  EXTRA:
    FINAL_CONV_KERNEL: 1
    STAGE2: {NUM_MODULES: 1, NUM_BRANCHES: 2, BLOCK: BASIC, NUM_BLOCKS: [1, 1], NUM_CHANNELS: [8, 16], FUSE_METHOD: SUM}
    STAGE3: {NUM_MODULES: 1, NUM_BRANCHES: 3, BLOCK: BASIC, NUM_BLOCKS: [1, 1, 1], NUM_CHANNELS: [8, 16, 32], FUSE_METHOD: SUM}
    STAGE4: {NUM_MODULES: 1, NUM_BRANCHES: 4, BLOCK: BASIC, NUM_BLOCKS: [1, 1, 1, 1], NUM_CHANNELS: [8, 16, 32, 64], FUSE_METHOD: SUM}
DISTANCE: 2
TPU:
  COMPUTE_DTYPE: float32
  DCN_OFFSET_GROUPS: 4
  DCN_MAX_OFFSET: 2
"""
    )

    out_dir = tmp_path / "out"
    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [
            sys.executable, osp.join(REPO, "tools", "demo.py"),
            "--cfg", str(cfg_path), "--frames", str(frames_dir),
            "--boxes", str(boxes_path), "--out", str(out_dir), "--vis",
        ],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]

    results = json.loads((out_dir / "keypoints.json").read_text())
    assert len(results) == 4
    for r in results:
        kps = np.asarray(r["keypoints"])
        assert kps.shape == (17, 3)
        assert np.isfinite(kps).all()
        # decoded coords land inside (an enlarged neighborhood of) the bbox
        x, y, w, h = r["bbox"]
        assert (kps[:, 0] > x - w) .all() and (kps[:, 0] < x + 2 * w).all()
    vis_files = list((out_dir / "vis").iterdir())
    assert vis_files, "skeleton overlays were not written"


@pytest.mark.slow
def test_demo_streaming_matches_batch(tmp_path, rng):
    """--streaming (cached-feature serving, crops locked at the first
    frame's boxes) must reproduce the batch protocol's keypoints when the
    boxes are static: same windows, same crops, features reused instead of
    recomputed (clamp boundary handling matches the batch path's frame
    clamping on both ends)."""
    frames_dir = tmp_path / "frames"
    frames_dir.mkdir()
    n = 5
    for i in range(n):
        img = rng.randint(0, 255, (128, 160, 3), np.uint8)
        cv2.imwrite(str(frames_dir / f"{i:06d}.jpg"), img)

    boxes = [
        {"frame": i, "bbox": [30.0, 20.0, 80.0, 90.0], "score": 0.9}
        for i in range(n)
    ]
    boxes_path = tmp_path / "boxes.json"
    boxes_path.write_text(json.dumps(boxes))

    cfg_path = tmp_path / "tiny.yaml"
    cfg_path.write_text(
        """
MODEL:
  NAME: FAMIPose
  NUM_JOINTS: 17
  IMAGE_SIZE: [96, 128]
  HEATMAP_SIZE: [24, 32]
  EXTRA:
    FINAL_CONV_KERNEL: 1
    STAGE2: {NUM_MODULES: 1, NUM_BRANCHES: 2, BLOCK: BASIC, NUM_BLOCKS: [1, 1], NUM_CHANNELS: [8, 16], FUSE_METHOD: SUM}
    STAGE3: {NUM_MODULES: 1, NUM_BRANCHES: 3, BLOCK: BASIC, NUM_BLOCKS: [1, 1, 1], NUM_CHANNELS: [8, 16, 32], FUSE_METHOD: SUM}
    STAGE4: {NUM_MODULES: 1, NUM_BRANCHES: 4, BLOCK: BASIC, NUM_BLOCKS: [1, 1, 1, 1], NUM_CHANNELS: [8, 16, 32, 64], FUSE_METHOD: SUM}
DISTANCE: 2
TPU:
  COMPUTE_DTYPE: float32
  DCN_OFFSET_GROUPS: 4
  DCN_MAX_OFFSET: 2
"""
    )

    env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
    outs = {}
    for mode, extra in (("batch", []), ("streaming", ["--streaming"])):
        out_dir = tmp_path / f"out_{mode}"
        proc = subprocess.run(
            [
                sys.executable, osp.join(REPO, "tools", "demo.py"),
                "--cfg", str(cfg_path), "--frames", str(frames_dir),
                "--boxes", str(boxes_path), "--out", str(out_dir),
            ] + extra,
            capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        outs[mode] = json.loads((out_dir / "keypoints.json").read_text())

    assert len(outs["batch"]) == len(outs["streaming"]) == n
    for rb, rs in zip(outs["batch"], outs["streaming"]):
        assert rb["frame"] == rs["frame"] and rb["bbox"] == rs["bbox"]
        kb = np.asarray(rb["keypoints"])
        ks = np.asarray(rs["keypoints"])
        # identical crops + cached-feature head vs full forward: the only
        # difference is XLA fusion rounding (f32-epsilon on heatmaps);
        # decoded pixel coords must agree tightly
        np.testing.assert_allclose(ks, kb, atol=1e-3)
