"""Jitted train / eval steps with mesh sharding.

The TPU-native heart of the framework (reference:
``engine/core/functions/alignment_mi_function_term6_1.py:72-220``): one
compiled function per config does forward + loss + backward + optimizer
update + on-device metrics. Batches arrive sharded on the mesh ``data`` axis;
parameters are replicated; XLA inserts the gradient all-reduce (and makes
BatchNorm statistics *global*, i.e. sync-BN — stronger than the reference's
per-GPU DataParallel BN; documented parity deviation, SURVEY §7 hard-part 3).

No per-step host syncs: PCK accuracy is computed on device from heatmap
argmax (``engine/core/utils/evaluate.py:13-75`` semantics) and fetched by the
caller only at PRINT_FREQ boundaries.
"""

import jax
import jax.numpy as jnp

from fami_pose_tpu.losses import fami_total_loss
from fami_pose_tpu.parallel.mesh import batch_sharding, replicate

from .train_state import TrainState


def heatmap_pck_accuracy(pred, target, thr: float = 0.5):
    """Train-time PCK from heatmap argmax — exact reference semantics
    (``engine/core/utils/evaluate.py:13-75``): a (sample, joint) pair is
    valid iff BOTH target argmax coords exceed 1 (``calc_dists``' per-coord
    ``target > 1`` check; zero-max targets get (0, 0) coords and fail it),
    distances normalize x by h/10 and y by w/10 (the reference's axis-swap
    quirk), per-joint accuracies are computed over valid pairs (``dist_acc``)
    and the average is UNWEIGHTED over joints that have >= 1 valid pair.

    pred/target: (B, H, W, J) NHWC. Returns (avg_acc, counted_joints).
    """
    b, h, w, j = pred.shape

    def argmax_xy(hm):
        flat = hm.reshape(b, h * w, j)
        idx = jnp.argmax(flat, axis=1)  # (B, J)
        maxv = jnp.max(flat, axis=1)
        x = (idx % w).astype(jnp.float32)
        y = (idx // w).astype(jnp.float32)
        # reference get_max_preds zeroes coords where max <= 0
        vis = (maxv > 0).astype(jnp.float32)
        return x * vis, y * vis, maxv

    px, py, _ = argmax_xy(pred.astype(jnp.float32))
    tx, ty, _ = argmax_xy(target.astype(jnp.float32))
    norm = jnp.asarray([h / 10.0, w / 10.0], jnp.float32)
    # reference normalizes (x, y) by (h/10, w/10) respectively
    # (evaluate.py:30: dists of [x,y]/norm with norm=[h,w]*0.1)
    d = jnp.sqrt(((px - tx) / norm[0]) ** 2 + ((py - ty) / norm[1]) ** 2)
    valid = (tx > 1) & (ty > 1)  # calc_dists: both target coords must be > 1
    correct = (d < thr) & valid
    cnt_j = jnp.sum(valid, axis=0)  # (J,) valid pairs per joint
    acc_j = jnp.sum(correct, axis=0) / jnp.maximum(cnt_j, 1)
    has = cnt_j > 0
    n_counted = jnp.sum(has)
    acc = jnp.where(
        n_counted > 0,
        jnp.sum(jnp.where(has, acc_j, 0.0)) / jnp.maximum(n_counted, 1),
        0.0,
    )
    return acc, n_counted


def make_train_step(
    model,
    mesh=None,
    mse_weight: float = 1.0,
    mi_alpha: float = 0.5,
    mi_beta: float = 0.1,
    donate: bool = True,
    bf16_grads: bool = False,
):
    """Build the jitted training step.

    Returns ``step_fn(state, batch) -> (state, metrics)`` where batch is a
    dict with keys ``kf`` (B,H,W,3), ``sup`` (B,H,W,3N), ``target``
    (B,h,w,J), ``target_weight`` (B,J).

    ``bf16_grads`` (``TPU.BF16_GRADS``): differentiate w.r.t. a bf16 cast of
    the parameters so backward cotangents ACCUMULATE in bf16 (the model casts
    params to bf16 at every use anyway, so the forward is unchanged); the
    f32 master copy lives in ``state.params`` and the optimizer update stays
    f32. Attacks the f32 convert/reduce bucket of the train step
    (docs/PERFORMANCE.md); only active when the model computes in bf16.
    """
    low = getattr(model, "dtype", jnp.float32) == jnp.bfloat16 and bf16_grads

    def step(state: TrainState, batch):
        def loss_fn(params):
            (final, sup_hms, kf_bb, mi), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["kf"],
                batch["sup"],
                train=True,
                mutable=["batch_stats"],
            )
            total, aux = fami_total_loss(
                final, sup_hms, mi,
                batch["target"], batch["target_weight"],
                mse_weight=mse_weight, mi_alpha=mi_alpha, mi_beta=mi_beta,
            )
            return total, (aux, mut["batch_stats"], final, kf_bb, sup_hms)

        diff_params = state.params
        if low:
            diff_params = jax.tree.map(
                lambda p: p.astype(jnp.bfloat16)
                if jnp.issubdtype(p.dtype, jnp.floating) else p,
                state.params,
            )
        (loss, (aux, new_stats, final, kf_bb, sup_hms)), grads = (
            jax.value_and_grad(loss_fn, has_aux=True)(diff_params)
        )
        if low:
            # one cheap cast back to the master dtype for the f32 Adam update
            grads = jax.tree.map(
                lambda g, p: g.astype(p.dtype), grads, state.params
            )
        new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
        acc, cnt = heatmap_pck_accuracy(final, batch["target"])
        acc_bb, _ = heatmap_pck_accuracy(kf_bb, batch["target"])
        metrics = dict(aux)
        metrics["acc"] = acc
        metrics["acc_kf_backbone"] = acc_bb
        for i, hm in enumerate(sup_hms):
            a, _ = heatmap_pck_accuracy(hm, batch["target"])
            metrics[f"acc_sup{i + 1}"] = a
        return new_state, metrics

    kwargs = {}
    if donate:
        kwargs["donate_argnums"] = (0,)
    if mesh is not None:
        bs = batch_sharding(mesh)
        rep = replicate(mesh)
        kwargs["in_shardings"] = (None, jax.tree.map(lambda _: bs, {
            "kf": 0, "sup": 0, "target": 0, "target_weight": 0,
        }))
        kwargs["out_shardings"] = None
    return jax.jit(step, **kwargs)


def make_eval_step(model, mesh=None, flip_test: bool = False, flip_pairs=None):
    """Build the jitted eval step: forward (+ optional flip-test averaging).

    Returns ``eval_fn(variables, kf, sup) -> (final_hm, kf_bb_hm)`` with
    heatmaps in float32 NHWC. On multi-process meshes the output heatmaps
    are REPLICATED (an XLA all-gather over ``data``) so every host can
    device_get the full global batch for the host-side protocol decode.
    """
    from fami_pose_tpu.data.keypoints import COCO_FLIP_PAIRS
    from fami_pose_tpu.ops.pose import flip_back_nhwc

    pairs = flip_pairs if flip_pairs is not None else COCO_FLIP_PAIRS

    def step(variables, kf, sup):
        final, kf_bb = model.apply(variables, kf, sup, train=False)
        if flip_test:
            f_final, _ = model.apply(
                variables, kf[:, :, ::-1, :], sup[:, :, ::-1, :], train=False
            )
            f_final = flip_back_nhwc(f_final, pairs)
            final = (final + f_final) * 0.5
        return final.astype(jnp.float32), kf_bb.astype(jnp.float32)

    kwargs = {}
    if mesh is not None:
        bs = batch_sharding(mesh)
        kwargs["in_shardings"] = (None, bs, bs)
        if jax.process_count() > 1:
            rep = replicate(mesh)
            kwargs["out_shardings"] = (rep, rep)
    return jax.jit(step, **kwargs)
