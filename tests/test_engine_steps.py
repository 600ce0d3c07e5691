"""Train/eval step tests: loss decreases, sharding works on an 8-dev mesh,
single-chip and multi-chip results agree."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.config import get_default_cfg
from fami_pose_tpu.engine.steps import (
    heatmap_pck_accuracy,
    make_eval_step,
    make_train_step,
)
from fami_pose_tpu.engine.train_state import create_train_state
from fami_pose_tpu.models.fami_pose import FAMIPose
from fami_pose_tpu.models.hrnet import TINY_EXTRA
from fami_pose_tpu.optim import build_optimizer, build_lr_schedule
from fami_pose_tpu.parallel.mesh import build_mesh, shard_batch


def _make_model():
    return FAMIPose(
        extra=TINY_EXTRA, num_joints=17, feat_channels=8, dcn_offset_groups=4
    )


def _make_batch(rng, b=2, h=64, w=64, n_sup=4):
    return {
        "kf": rng.rand(b, h, w, 3).astype(np.float32),
        "sup": rng.rand(b, h, w, 3 * n_sup).astype(np.float32),
        "target": rng.rand(b, h // 4, w // 4, 17).astype(np.float32) * 0.1,
        "target_weight": np.ones((b, 17), np.float32),
    }


@pytest.fixture(scope="module")
def setup():
    model = _make_model()
    cfg = get_default_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 12))),
    )
    return model, cfg, tx, state


@pytest.mark.slow
def test_train_step_decreases_loss(setup, rng):
    model, cfg, tx, state = setup
    step_fn = make_train_step(model, donate=False)
    batch = jax.tree.map(jnp.asarray, _make_batch(rng))
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    assert int(state.step) == 5
    # metrics contract
    for k in ("loss_mse", "loss_sup_mse", "loss_mi", "acc", "acc_kf_backbone",
              "acc_sup1", "acc_sup4", "loss_mi_6"):
        assert k in metrics


@pytest.mark.slow
def test_train_step_sharded_matches_single(setup, rng):
    """Same batch through the 8-device mesh and single device: same loss."""
    model, cfg, tx, state = setup
    batch = _make_batch(rng, b=8)
    jb = jax.tree.map(jnp.asarray, batch)

    single = make_train_step(model, donate=False)
    _, m_single = single(state, jb)

    mesh = build_mesh(jax.devices()[:8], mesh_shape=[8, 1])
    with mesh:
        sharded_step = make_train_step(model, mesh=mesh, donate=False)
        sb = shard_batch(batch, mesh)
        _, m_sharded = sharded_step(state, sb)

    np.testing.assert_allclose(
        float(m_single["loss"]), float(m_sharded["loss"]), rtol=1e-4
    )


@pytest.mark.slow
def test_eval_step_and_flip_test(setup, rng):
    model, cfg, tx, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = _make_batch(rng)
    kf, sup = jnp.asarray(batch["kf"]), jnp.asarray(batch["sup"])

    plain = make_eval_step(model)
    hm, kf_bb = plain(variables, kf, sup)
    assert hm.shape == (2, 16, 16, 17) and hm.dtype == jnp.float32

    fliptest = make_eval_step(model, flip_test=True)
    hm2, _ = fliptest(variables, kf, sup)
    assert hm2.shape == hm.shape
    assert np.isfinite(np.asarray(hm2)).all()


def test_pck_accuracy_perfect_and_shifted():
    b, h, w, j = 1, 32, 32, 3
    target = np.zeros((b, h, w, j), np.float32)
    for ji, (y, x) in enumerate([(5, 6), (10, 20), (25, 12)]):
        target[0, y, x, ji] = 1.0
    acc, cnt = heatmap_pck_accuracy(jnp.asarray(target), jnp.asarray(target))
    assert float(acc) == 1.0 and int(cnt) == 3

    # move one joint far away -> 2/3 correct
    pred = target.copy()
    pred[0, 25, 12, 2] = 0
    pred[0, 2, 2, 2] = 1.0
    acc, cnt = heatmap_pck_accuracy(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(acc), 2.0 / 3.0, rtol=1e-6)


def _reference_accuracy(output_nchw, target_nchw, thr=0.5):
    """Numpy transliteration of the reference PCK meter
    (``engine/core/utils/evaluate.py:13-75``) for differential testing."""
    b, j, h, w = output_nchw.shape

    def get_max_preds(hm):
        flat = hm.reshape(b, j, -1)
        idx = flat.argmax(axis=2)
        maxv = flat.max(axis=2)
        pred = np.stack([idx % w, idx // w], axis=-1).astype(np.float32)
        pred *= (maxv > 0)[..., None]
        return pred

    pred = get_max_preds(output_nchw)
    tgt = get_max_preds(target_nchw)
    norm = np.array([h, w], np.float32) / 10.0
    accs, cnt, total = [], 0, 0.0
    for c in range(j):
        dists = []
        for n in range(b):
            if tgt[n, c, 0] > 1 and tgt[n, c, 1] > 1:
                dists.append(
                    np.linalg.norm((pred[n, c] - tgt[n, c]) / norm)
                )
        if dists:
            total += np.mean(np.asarray(dists) < thr)
            cnt += 1
    return (total / cnt if cnt else 0.0), cnt


def test_pck_accuracy_matches_reference_meter():
    """Differential vs the reference accuracy incl. the border case where
    the old ``tmax > 0`` proxy and the exact per-coord ``target > 1`` check
    DISAGREE: a target peaked at x=1 (max > 0) must be EXCLUDED."""
    rng = np.random.RandomState(0)
    b, h, w, j = 4, 32, 24, 5
    target = np.zeros((b, h, w, j), np.float32)
    pred = np.zeros_like(target)
    for n in range(b):
        for c in range(j):
            ty, tx = rng.randint(0, h), rng.randint(0, w)
            target[n, ty, tx, c] = 1.0
            py = np.clip(ty + rng.randint(-3, 4), 0, h - 1)
            px = np.clip(tx + rng.randint(-3, 4), 0, w - 1)
            pred[n, py, px, c] = 1.0
    # force the disagreement cases: peaks on/near the low borders
    target[0, :, :, 0] = 0.0
    target[0, 5, 1, 0] = 1.0   # x == 1 -> excluded though max > 0
    target[1, :, :, 1] = 0.0
    target[1, 1, 7, 1] = 1.0   # y == 1 -> excluded
    target[2, :, :, 2] = 0.0   # zero-max -> excluded
    # one joint with NO valid samples anywhere: must not count toward avg
    target[:, :, :, 4] = 0.0
    target[:, 0, 0, 4] = 1.0   # coords (0,0) -> all invalid

    ref_acc, ref_cnt = _reference_accuracy(
        target.transpose(0, 3, 1, 2).copy(), target.transpose(0, 3, 1, 2)
    )
    acc, cnt = heatmap_pck_accuracy(jnp.asarray(target), jnp.asarray(target))
    np.testing.assert_allclose(float(acc), ref_acc, rtol=1e-6)
    assert int(cnt) == ref_cnt

    ref_acc, ref_cnt = _reference_accuracy(
        pred.transpose(0, 3, 1, 2), target.transpose(0, 3, 1, 2)
    )
    acc, cnt = heatmap_pck_accuracy(jnp.asarray(pred), jnp.asarray(target))
    np.testing.assert_allclose(float(acc), ref_acc, rtol=1e-6)
    assert int(cnt) == ref_cnt
    # the proxy would have counted joint 0/1 rows as valid; exact check must
    # yield a different validity set (sanity that the case is exercised)
    assert ref_cnt == 4  # joint 4 fully excluded


def test_lr_schedule_multistep():
    cfg = get_default_cfg()
    cfg.TRAIN.LR = 1e-3
    cfg.TRAIN.LR_FACTOR = 0.1
    cfg.TRAIN.LR_STEP = [10, 15]
    sched = build_lr_schedule(cfg, steps_per_epoch=2)
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(19)), 1e-3)
    np.testing.assert_allclose(float(sched(20)), 1e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(30)), 1e-5, rtol=1e-5)


def test_second_param_group():
    cfg = get_default_cfg()
    cfg.TRAIN.LR_SECOND_GROUP = ["head"]
    cfg.TRAIN.LR_SECOND_GROUP_VALUE = 1e-6
    tx = build_optimizer(cfg, steps_per_epoch=1)
    params = {
        "head": {"kernel": jnp.ones((3, 3))},
        "body": {"kernel": jnp.ones((3, 3))},
    }
    opt_state = tx.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, _ = tx.update(grads, opt_state, params)
    # adam normalizes, so |update| == lr for constant grads
    up_head = float(jnp.abs(updates["head"]["kernel"]).max())
    up_body = float(jnp.abs(updates["body"]["kernel"]).max())
    assert up_head < up_body
    np.testing.assert_allclose(up_body, 1e-3, rtol=1e-3)
    np.testing.assert_allclose(up_head, 1e-6, rtol=1e-3)


@pytest.mark.slow
def test_eval_step_sharded(setup, rng):
    """Eval step with batch sharded over the 8-device mesh."""
    model, cfg, tx, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = _make_batch(rng, b=8)
    mesh = build_mesh(jax.devices()[:8], mesh_shape=[8, 1])
    with mesh:
        ev = make_eval_step(model, mesh=mesh)
        sb = shard_batch(
            {"kf": batch["kf"], "sup": batch["sup"]}, mesh
        )
        hm, kf_bb = ev(variables, sb["kf"], sb["sup"])
    # matches the unsharded result
    hm0, _ = make_eval_step(model)(variables, jnp.asarray(batch["kf"]),
                                   jnp.asarray(batch["sup"]))
    np.testing.assert_allclose(
        np.asarray(hm), np.asarray(hm0), rtol=2e-4, atol=2e-4
    )


@pytest.mark.slow
def test_core_function_builds_sharded_eval_step(setup, rng):
    """Evaluator wiring: AlignmentMIFunction.build_eval_step accepts mesh +
    flip_test + flip_pairs together (VERDICT r1: signature split between
    BaseCoreFunction and the implementation)."""
    from fami_pose_tpu.config import get_default_cfg
    from fami_pose_tpu.engine.core_functions import build_core_function

    model, cfg, tx, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    batch = _make_batch(rng, b=8)
    core = build_core_function(get_default_cfg())
    mesh = build_mesh(jax.devices()[:8], mesh_shape=[8, 1])
    with mesh:
        ev = core.build_eval_step(
            model, mesh=mesh, flip_test=True, flip_pairs=[(1, 2), (3, 4)]
        )
        sb = shard_batch({"kf": batch["kf"], "sup": batch["sup"]}, mesh)
        hm, _ = ev(variables, sb["kf"], sb["sup"])
    ev0 = core.build_eval_step(
        model, flip_test=True, flip_pairs=[(1, 2), (3, 4)]
    )
    hm0, _ = ev0(variables, jnp.asarray(batch["kf"]), jnp.asarray(batch["sup"]))
    np.testing.assert_allclose(
        np.asarray(hm), np.asarray(hm0), rtol=2e-4, atol=2e-4
    )


def test_train_step_bf16_grads(rng):
    """TPU.BF16_GRADS: cotangents accumulate in bf16 against a bf16 model;
    the f32 master params still update and the loss still decreases."""
    model = FAMIPose(
        extra=TINY_EXTRA, num_joints=17, feat_channels=8,
        dcn_offset_groups=4, dtype=jnp.bfloat16,
    )
    cfg = get_default_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 12))),
    )
    step_fn = make_train_step(model, donate=False, bf16_grads=True)
    batch = jax.tree.map(jnp.asarray, _make_batch(rng))
    losses = []
    for _ in range(5):
        state, metrics = step_fn(state, batch)
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
    # master params stayed f32
    assert all(
        l.dtype == jnp.float32
        for l in jax.tree.leaves(state.params)
        if jnp.issubdtype(l.dtype, jnp.floating)
    )


def test_bf16_grads_inactive_for_f32_model(rng):
    """The flag is a no-op for f32 compute (e.g. CPU test configs)."""
    model = _make_model()  # f32
    cfg = get_default_cfg()
    tx = build_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0),
        (jnp.zeros((1, 64, 64, 3)), jnp.zeros((1, 64, 64, 12))),
    )
    batch = jax.tree.map(jnp.asarray, _make_batch(rng))
    s_on = make_train_step(model, donate=False, bf16_grads=True)
    s_off = make_train_step(model, donate=False, bf16_grads=False)
    _, m_on = s_on(state, batch)
    _, m_off = s_off(state, batch)
    np.testing.assert_array_equal(
        np.float32(m_on["loss"]), np.float32(m_off["loss"])
    )
