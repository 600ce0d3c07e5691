"""Offset-field target generator (DEKR-style).

Port surface of the reference's ``datasets/target_generators/
target_generators.py:11-88`` (``OffsetGenerator``): per-joint (dx, dy) offset
maps + weights between two frames' joints — present in the reference but not
wired into the shipped pipeline; kept available for offset-supervised
variants. Vectorized over joints (no per-joint Python loops) and jittable.
"""

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("output_size", "radius", "per_pixel"))
def generate_offset_targets(
    joints_a,
    joints_b,
    joints_vis,
    output_size,
    radius: int = 4,
    per_pixel: bool = True,
):
    """Offset targets from frame A joints toward frame B joints.

    Args:
      joints_a, joints_b: (B, J, 2) coords in heatmap pixels.
      joints_vis: (B, J) visibility of both.
      output_size: static (w, h).
      radius: stamp radius around the frame-A joint.
      per_pixel: per-pixel offsets within the radius (True) or a constant
        global offset per joint (False).

    Returns:
      offsets: (B, h, w, J, 2) float32, weights: (B, h, w, J) float32.
    """
    w, h = int(output_size[0]), int(output_size[1])
    a = joints_a.astype(jnp.float32)
    b = joints_b.astype(jnp.float32)
    vis = joints_vis.astype(jnp.float32)

    ys = jnp.arange(h, dtype=jnp.float32)
    xs = jnp.arange(w, dtype=jnp.float32)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")  # (h, w)

    ax = a[..., 0][:, None, None, :]  # (B, 1, 1, J)
    ay = a[..., 1][:, None, None, :]
    bx = b[..., 0][:, None, None, :]
    by = b[..., 1][:, None, None, :]
    gxx = gx[None, :, :, None]
    gyy = gy[None, :, :, None]

    within = (jnp.abs(gxx - ax) <= radius) & (jnp.abs(gyy - ay) <= radius)
    weight = within.astype(jnp.float32) * vis[:, None, None, :]

    if per_pixel:
        dx = bx - gxx
        dy = by - gyy
    else:
        dx = jnp.broadcast_to(bx - ax, weight.shape)
        dy = jnp.broadcast_to(by - ay, weight.shape)
    offsets = jnp.stack([dx, dy], axis=-1) * weight[..., None]
    return offsets, weight
