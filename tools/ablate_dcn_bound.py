"""Quantify the bounded-offset DCN deviation (VERDICT round-1 item 5).

The TPU fast path (``ops.deform_conv.deform_conv2d_windowed`` and the fused
Pallas kernel) clamps sampling offsets to ``[-D, D]`` where the reference's
torchvision DeformConv2d (``Alignment_V15.py:83-101``) is unbounded. This
script measures, for offset magnitudes drawn at several scales:

  * what fraction of offsets the window clips,
  * the elementwise output deviation vs the exact gather implementation,
  * the decoded-keypoint drift: argmax + ±0.25-shift sub-pixel decode of the
    output channels treated as heatmaps (the quantity that actually reaches
    the evaluation protocol).

Run: ``python tools/ablate_dcn_bound.py`` (CPU ok). Results are recorded in
``docs/DCN_OFFSET_BOUND.md``.
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp

from fami_pose_tpu.ops.deform_conv import deform_conv2d, deform_conv2d_windowed
from fami_pose_tpu.ops.heatmap import get_max_preds


def decode(hm_nhwc):
    """argmax + quarter-pixel decode, NHWC -> (N, J, 2)."""
    hm = np.transpose(np.asarray(hm_nhwc, np.float32), (0, 3, 1, 2))
    coords, _ = get_max_preds(hm)
    return np.asarray(coords)


def main():
    rng = np.random.RandomState(19970808)
    n, h, w, c, g, k = 2, 96, 72, 48, 12, 9
    c_out = 17
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    wgt = jnp.asarray((rng.randn(3, 3, c, c_out) * 0.1).astype(np.float32))
    msk = jnp.asarray(rng.rand(n, h, w, g * k).astype(np.float32))

    print(f"{'sigma':>6} {'D':>3} {'clip%':>7} {'max|dY|':>9} {'rel_err':>9} "
          f"{'kpt>0px%':>9} {'kpt_max_px':>10}")
    rows = []
    for sigma in (0.5, 1.0, 2.0, 4.0, 8.0):
        off_np = (rng.randn(n, h, w, 2 * g * k) * sigma).astype(np.float32)
        off = jnp.asarray(off_np)
        exact = deform_conv2d(
            x, off, msk, wgt, padding=3, dilation=3, offset_groups=g
        )
        ref_kpts = decode(exact)
        scale = float(jnp.max(jnp.abs(exact)))
        for d in (4, 6):
            windowed = deform_conv2d_windowed(
                x, off, msk, wgt, padding=3, dilation=3, offset_groups=g,
                max_offset=d,
            )
            clip_frac = float(np.mean(np.abs(off_np) > d)) * 100
            max_dev = float(jnp.max(jnp.abs(windowed - exact)))
            kpts = decode(windowed)
            drift = np.sqrt(((kpts - ref_kpts) ** 2).sum(-1))
            row = (sigma, d, clip_frac, max_dev, max_dev / scale,
                   float((drift > 0).mean()) * 100, float(drift.max()))
            rows.append(row)
            print(f"{sigma:6.1f} {d:3d} {row[2]:7.2f} {row[3]:9.4f} "
                  f"{row[4]:9.5f} {row[5]:9.2f} {row[6]:10.2f}")
    return rows


if __name__ == "__main__":
    main()
