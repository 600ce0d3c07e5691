"""Box-IoU and OKS (keypoint-similarity) non-maximum suppression.

Replaces the reference's Cython/CUDA box NMS (``thirdparty/nms/``) and
numpy OKS-NMS (``datasets/process/nms.py:9-192``) with a matrix
formulation: the full pairwise similarity matrix is computed once
(vectorized — MXU/VPU friendly), and greedy suppression is a fixed-length
masked scan. The jnp versions run fused on device under jit with static
shapes; the numpy versions serve the host-side detection-preprocessing
path (plus a C++ kernel, see ``csrc/``).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..data.keypoints import COCO_OKS_SIGMAS


# -- pairwise similarity matrices ------------------------------------------------

def _box_iou_matrix(xp, boxes):
    """boxes (N, 4) xyxy -> (N, N) IoU with the +1 extent convention."""
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    areas = (x2 - x1 + 1) * (y2 - y1 + 1)
    xx1 = xp.maximum(x1[:, None], x1[None, :])
    yy1 = xp.maximum(y1[:, None], y1[None, :])
    xx2 = xp.minimum(x2[:, None], x2[None, :])
    yy2 = xp.minimum(y2[:, None], y2[None, :])
    inter = xp.maximum(0.0, xx2 - xx1 + 1) * xp.maximum(0.0, yy2 - yy1 + 1)
    return inter / (areas[:, None] + areas[None, :] - inter)


def _oks_matrix(xp, kpts, areas, sigmas):
    """kpts (N, J, 3), areas (N,) -> (N, N) object-keypoint-similarity."""
    var = (sigmas * 2.0) ** 2  # (J,)
    dx = kpts[:, None, :, 0] - kpts[None, :, :, 0]
    dy = kpts[:, None, :, 1] - kpts[None, :, :, 1]
    mean_area = (areas[:, None] + areas[None, :]) / 2.0 + np.spacing(1)
    e = (dx * dx + dy * dy) / var[None, None, :] / mean_area[..., None] / 2.0
    return xp.mean(xp.exp(-e), axis=-1)


def _greedy_suppress_np(sim, scores, thr):
    """Greedy NMS on a precomputed similarity matrix (numpy)."""
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(scores), dtype=bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(int(i))
        suppressed |= sim[i] > thr
        suppressed[i] = True  # self-similarity must not drop the kept item twice
    return keep


# -- host (numpy) API ----------------------------------------------------------

def nms(dets, thr):
    """Greedy box NMS. dets: (N, 5) [x1 y1 x2 y2 score]. Returns kept indices."""
    dets = np.asarray(dets, dtype=np.float64)
    if len(dets) == 0:
        return []
    sim = _box_iou_matrix(np, dets[:, :4])
    return _greedy_suppress_np(sim, dets[:, 4], thr)


def oks_iou(g, d, a_g, a_d, sigmas=None, vis_thr=None):
    """OKS of one pose ``g`` (J*3 flat) against each row of ``d`` (N, J*3)."""
    sigmas = COCO_OKS_SIGMAS if sigmas is None else np.asarray(sigmas)
    g = np.asarray(g, np.float64).reshape(-1, 3)
    d = np.asarray(d, np.float64).reshape(len(d), -1, 3)
    var = (sigmas * 2.0) ** 2
    mean_area = (a_g + np.asarray(a_d, np.float64)) / 2.0 + np.spacing(1)
    e = ((d[:, :, 0] - g[None, :, 0]) ** 2 + (d[:, :, 1] - g[None, :, 1]) ** 2)
    e = e / var[None, :] / mean_area[:, None] / 2.0
    if vis_thr is not None:
        mask = (g[None, :, 2] > vis_thr) & (d[:, :, 2] > vis_thr)
        num = np.where(mask, np.exp(-e), 0.0).sum(axis=1)
        cnt = mask.sum(axis=1)
        return np.where(cnt > 0, num / np.maximum(cnt, 1), 0.0).astype(np.float32)
    return np.exp(-e).mean(axis=1).astype(np.float32)


def oks_nms(kpts_db, thr, sigmas=None, vis_thr=None):
    """Greedy OKS NMS over a list of {'score', 'keypoints' (J,3), 'area'}."""
    if len(kpts_db) == 0:
        return []
    sigmas = COCO_OKS_SIGMAS if sigmas is None else np.asarray(sigmas)
    scores = np.array([k["score"] for k in kpts_db], dtype=np.float64)
    kpts = np.stack([np.asarray(k["keypoints"], np.float64).reshape(-1, 3) for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db], dtype=np.float64)
    if vis_thr is None:
        sim = _oks_matrix(np, kpts, areas, sigmas)
        return np.array(_greedy_suppress_np(sim, scores, thr))
    # visibility-gated variant falls back to pairwise oks_iou rows
    n = len(kpts_db)
    sim = np.zeros((n, n))
    flat = kpts.reshape(n, -1)
    for i in range(n):
        sim[i] = oks_iou(flat[i], flat, areas[i], areas, sigmas, vis_thr)
    return np.array(_greedy_suppress_np(sim, scores, thr))


def soft_oks_nms(kpts_db, thr, max_dets=20, sigmas=None, vis_thr=None):
    """Soft OKS NMS with Gaussian rescoring (reference ``nms.py:150-192``)."""
    if len(kpts_db) == 0:
        return []
    sigmas = COCO_OKS_SIGMAS if sigmas is None else np.asarray(sigmas)
    scores = np.array([k["score"] for k in kpts_db], dtype=np.float64)
    kpts = np.stack([np.asarray(k["keypoints"], np.float64).reshape(-1, 3) for k in kpts_db])
    areas = np.array([k["area"] for k in kpts_db], dtype=np.float64)
    sim = _oks_matrix(np, kpts, areas, sigmas)

    order = list(np.argsort(-scores, kind="stable"))
    cur_scores = scores[order].copy()
    keep = []
    while order and len(keep) < max_dets:
        i = order.pop(0)
        keep.append(int(i))
        rest_scores = cur_scores[1:] * np.exp(-sim[i, order] ** 2 / thr)
        resort = np.argsort(-rest_scores, kind="stable")
        order = [order[j] for j in resort]
        cur_scores = rest_scores[resort]
    return np.array(keep)


# -- device (jnp) API: fused, fixed shape -------------------------------------------

@partial(jax.jit, static_argnames=("thr",))
def oks_nms_device(kpts, scores, areas, valid, thr: float = 0.9):
    """Fused on-device greedy OKS NMS.

    Args:
      kpts: (N, J, 3) poses (fixed N; pad unused slots).
      scores: (N,), areas: (N,), valid: (N,) bool for real entries.
      thr: suppression threshold.

    Returns:
      keep: (N,) bool mask of survivors.
    """
    sim = _oks_matrix(jnp, kpts.astype(jnp.float32), areas.astype(jnp.float32),
                      jnp.asarray(COCO_OKS_SIGMAS, jnp.float32))
    return _greedy_suppress_jnp(sim, scores, valid, thr)


@partial(jax.jit, static_argnames=("thr",))
def box_nms_device(boxes, scores, valid, thr: float = 0.6):
    """Fused on-device greedy box NMS. boxes (N, 4) xyxy."""
    sim = _box_iou_matrix(jnp, boxes.astype(jnp.float32))
    return _greedy_suppress_jnp(sim, scores, valid, thr)


def _greedy_suppress_jnp(sim, scores, valid, thr):
    n = scores.shape[0]
    order = jnp.argsort(-jnp.where(valid, scores, -jnp.inf))

    def body(k, state):
        alive, keep = state
        i = order[k]
        is_live = alive[i] & valid[i]
        keep = keep.at[i].set(is_live)
        suppress = sim[i] > thr
        alive = jnp.where(is_live, alive & ~suppress, alive)
        alive = alive.at[i].set(False)
        return alive, keep

    alive0 = jnp.ones((n,), dtype=bool)
    keep0 = jnp.zeros((n,), dtype=bool)
    _, keep = jax.lax.fori_loop(0, n, body, (alive0, keep0))
    return keep
