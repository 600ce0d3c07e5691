"""Integral-regression coordinate decode
(reference ``datasets/process/coordinate_process.py:6-20``):
de-normalize soft-argmax outputs and map back through the inverse affine."""

from functools import partial

import jax
import jax.numpy as jnp

from .heatmap import transform_preds


@partial(jax.jit, static_argnames=("heatmap_size",))
def get_final_preds_coord(batch_keypoints, center, scale, heatmap_size):
    """batch_keypoints: (B, J, 3) with normalized coords in [-0.5, 0.5]
    (+score); heatmap_size: static (w, h). Returns (preds, maxvals)."""
    w, h = int(heatmap_size[0]), int(heatmap_size[1])
    coords = batch_keypoints[..., :2].astype(jnp.float32)
    maxvals = batch_keypoints[..., 2:3].astype(jnp.float32)
    coords = coords.at[..., 0].set((coords[..., 0] + 0.5) * w)
    coords = coords.at[..., 1].set((coords[..., 1] + 0.5) * h)
    preds = transform_preds(coords, center, scale, (w, h))
    return preds, maxvals
