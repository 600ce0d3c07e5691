"""Optional losses the reference references but does not ship.

``posetimation/loss/base.py:11`` imports a missing ``integral_loss`` module
whose classes (``IntegralL1Loss``, ``StructureCosineSimilarity``) are
constructed by the core function (``alignment_mi_function_term6_1.py:61-62``)
— a NameError as shipped (SURVEY §2.7). Re-derived here from their standard
formulations; both are config-gated OFF by default
(``LOSS.INTEGRAL_L1.USE`` / ``LOSS.STRUCTURE_COSINE.USE``), matching the
shipped configs.
"""

from typing import Sequence

import jax
import jax.numpy as jnp

# COCO-17 limb segments for the structure loss
COCO_LIMBS = (
    (5, 7), (7, 9), (6, 8), (8, 10), (11, 13), (13, 15), (12, 14), (14, 16),
    (5, 6), (11, 12), (5, 11), (6, 12),
)


def soft_argmax(heatmaps, temperature: float = 1.0):
    """Differentiable heatmap -> normalized (x, y) in [0, 1].

    heatmaps: (B, H, W, J) NHWC. Returns (B, J, 2).
    """
    b, h, w, j = heatmaps.shape
    flat = heatmaps.astype(jnp.float32).reshape(b, h * w, j) / temperature
    p = jax.nn.softmax(flat, axis=1).reshape(b, h, w, j)
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) / h
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) / w
    ey = jnp.einsum("bhwj,h->bj", p, ys)
    ex = jnp.einsum("bhwj,w->bj", p, xs)
    return jnp.stack([ex, ey], axis=-1)


def integral_l1_loss(pred_hm, target_joints, target_weight=None,
                     image_size=None):
    """Integral-regression L1: soft-argmax coords vs GT joints.

    pred_hm: (B, H, W, J); target_joints: (B, J, 2) in input-image pixels;
    image_size: (w, h) to normalize the targets.
    """
    coords = soft_argmax(pred_hm)  # normalized
    t = target_joints.astype(jnp.float32)
    if image_size is not None:
        t = t / jnp.asarray(image_size, jnp.float32)
    err = jnp.abs(coords - t)
    if target_weight is not None:
        err = err * target_weight.astype(jnp.float32)[..., None]
    return jnp.mean(err)


def structure_cosine_loss(pred_hm, target_joints, target_weight=None,
                          limbs: Sequence = COCO_LIMBS, image_size=None):
    """Limb-direction cosine similarity between predicted and GT skeletons.

    Penalizes 1 - cos(angle) per limb, weighted by both endpoint weights.
    """
    coords = soft_argmax(pred_hm)
    t = target_joints.astype(jnp.float32)
    if image_size is not None:
        t = t / jnp.asarray(image_size, jnp.float32)
    la = jnp.asarray([a for a, _ in limbs])
    lb = jnp.asarray([b for _, b in limbs])
    vp = coords[:, lb] - coords[:, la]  # (B, L, 2)
    vt = t[:, lb] - t[:, la]
    eps = 1e-6
    cos = jnp.sum(vp * vt, -1) / (
        jnp.linalg.norm(vp, axis=-1) * jnp.linalg.norm(vt, axis=-1) + eps
    )
    loss = 1.0 - cos
    if target_weight is not None:
        w = target_weight.astype(jnp.float32)
        loss = loss * w[:, la] * w[:, lb]
    return jnp.mean(loss)
