"""Training losses, fully jittable.

``joint_mse_loss`` mirrors the reference ``JointMSELoss``
(``posetimation/loss/mse_loss.py:13-40``): per-joint MSE over flattened
heatmaps, optional per-joint target weights, optional division by the joint
count. ``fami_total_loss`` reproduces the exact loss combination of the
training loop (``engine/core/functions/alignment_mi_function_term6_1.py:
106-148``): weighted final-heatmap MSE + per-sup warped-heatmap MSE + the
6-term MI combination with alpha=0.5, beta=0.1 and the +/- sign pattern.

The reference's ``build_loss`` import of the absent ``integral_loss`` module
(``loss/base.py:11``, SURVEY §2.7) is resolved here by simply not shipping the
broken optional losses; ``build_loss`` dispatches on ``cfg.LOSS.NAME``.
"""

from typing import Dict, Sequence, Tuple

import jax.numpy as jnp

MI_ALPHA = 0.5
MI_BETA = 0.1
# sign per MI term (alignment_mi_function_term6_1.py:122-147):
#   -beta*mi1 + beta*mi2 + mi3 - mi4 + mi5 - mi6, all scaled by alpha
MI_COEFFS = (-MI_BETA, MI_BETA, 1.0, -1.0, 1.0, -1.0)


def joint_mse_loss(
    pred,
    target,
    target_weight=None,
    use_target_weight: bool = True,
    divide_num_joints: bool = True,
):
    """Heatmap MSE (NHWC: (B, H, W, J); target_weight: (B, J) or (B, J, 1)).

    Matches torch ``MSELoss(reduction='mean')`` per joint then summed over
    joints (optionally / num_joints).
    """
    b = pred.shape[0]
    j = pred.shape[-1]
    p = pred.astype(jnp.float32).reshape(b, -1, j)
    t = target.astype(jnp.float32).reshape(b, -1, j)
    if use_target_weight and target_weight is not None:
        w = target_weight.astype(jnp.float32).reshape(b, 1, j)
        p = p * w
        t = t * w
    # mean over (B, HW) per joint, summed over joints
    loss = jnp.sum(jnp.mean((p - t) ** 2, axis=(0, 1)))
    if divide_num_joints:
        loss = loss / j
    return loss


def fami_total_loss(
    final_hm,
    sup_hms: Sequence,
    mi_list: Sequence,
    target,
    target_weight,
    mse_weight: float = 1.0,
    mi_alpha: float = MI_ALPHA,
    mi_beta: float = MI_BETA,
) -> Tuple[jnp.ndarray, Dict]:
    """Full FAMI-Pose training loss; returns (total, per-term dict)."""
    loss_mse = joint_mse_loss(final_hm, target, target_weight) * mse_weight
    loss_sup = 0.0
    for hm in sup_hms:
        loss_sup = loss_sup + joint_mse_loss(hm, target, target_weight) * mse_weight
    coeffs = (-mi_beta, mi_beta, 1.0, -1.0, 1.0, -1.0)
    loss_mi = 0.0
    for coeff, mi in zip(coeffs, mi_list):
        loss_mi = loss_mi + coeff * mi
    loss_mi = mi_alpha * loss_mi
    total = loss_mse + loss_sup + loss_mi
    aux = {
        "loss": total,
        "loss_mse": loss_mse,
        "loss_sup_mse": loss_sup,
        "loss_mi": loss_mi,
    }
    for i, mi in enumerate(mi_list):
        aux[f"loss_mi_{i + 1}"] = mi
    return total, aux


def build_loss(cfg):
    """Heatmap-MSE loss factory from ``cfg.LOSS.HEATMAP_MSE`` (the reference's
    core function constructs ``JointMSELoss()`` directly and scales by
    ``LOSS.HEATMAP_MSE.WEIGHT``; ``alignment_mi_function_term6_1.py:60,69``)."""
    node = cfg.LOSS.HEATMAP_MSE
    weight = float(node.WEIGHT)
    divide = bool(getattr(node, "DIVIDED_NUM_JOINTS", True))

    def fn(pred, target, target_weight=None):
        return weight * joint_mse_loss(
            pred, target, target_weight, divide_num_joints=divide
        )

    return fn
