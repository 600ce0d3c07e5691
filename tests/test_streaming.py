"""Streaming serving (engine/streaming.py): split exactness + cache reuse.

The mode="features"/"head" split and the rolling-buffer streaming step must
reproduce the full forward bitwise (given identical per-frame crops — the
"crop-locked" regime the module docstring defines). The reference has no
streaming path; the batch forward (``Alignment_V15.py:113-163``) is the
oracle here.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fami_pose_tpu.engine.streaming import (
    StreamingPosePredictor,
    init_state,
    make_step,
    window_order,
)
from fami_pose_tpu.models.fami_pose import FAMIPose
from fami_pose_tpu.models.hrnet import TINY_EXTRA

B, H, W = 2, 64, 64
DISTANCE = 3
NUM_SUP = 2 * (DISTANCE - 1)


@pytest.fixture(scope="module")
def model_and_vars():
    m = FAMIPose(
        extra=TINY_EXTRA, num_joints=17, feat_channels=8, dcn_offset_groups=4
    )
    kf = jnp.zeros((B, H, W, 3))
    sup = jnp.zeros((B, H, W, 3 * NUM_SUP))
    v = m.init(jax.random.PRNGKey(0), kf, sup, train=False)
    return m, v


def _frames(rng, n):
    """n consecutive video frames per stream: (n, B, H, W, 3)."""
    return jnp.asarray(rng.rand(n, B, H, W, 3).astype(np.float32))


def _clip_inputs(frames, t, distance=DISTANCE):
    """Build the batch-protocol (kf_x, sup_x) for key frame t, with
    clamp-to-first boundary (matching the primed streaming buffer)."""
    deltas = list(range(distance - 1, 0, -1))  # prev farthest-first
    sup_ts = [max(t - d, 0) for d in deltas] + [
        t + d for d in range(1, distance)
    ]
    sup = jnp.concatenate([frames[s] for s in sup_ts], axis=-1)
    return frames[t], sup


def test_window_order():
    assert window_order(3) == [2, 0, 1, 3, 4]
    assert window_order(2) == [1, 0, 2]


def test_features_head_composition_is_exact(model_and_vars, rng):
    """full forward == features -> fold -> head, bitwise."""
    m, v = model_and_vars
    kf = jnp.asarray(rng.rand(B, H, W, 3).astype(np.float32))
    sup = jnp.asarray(rng.rand(B, H, W, 3 * NUM_SUP).astype(np.float32))
    full_hm, full_kf_bb = m.apply(v, kf, sup, train=False)

    x = jnp.concatenate([kf] + jnp.split(sup, NUM_SUP, axis=-1), axis=0)
    bb_hm, feat = m.apply(v, x, None, train=False, mode="features")
    split_hm, split_kf_bb = m.apply(
        v, feat, bb_hm[:B], train=False, mode="head"
    )
    np.testing.assert_array_equal(np.asarray(full_hm), np.asarray(split_hm))
    np.testing.assert_array_equal(
        np.asarray(full_kf_bb), np.asarray(split_kf_bb)
    )


def test_streaming_matches_batch_protocol(model_and_vars, rng):
    """Feed a 7-frame video through the jitted streaming step; every emitted
    key frame must equal the batch forward on the same (crop-locked) window.
    Interior frames are exact; boundary frames use the clamp-to-first
    convention that _clip_inputs reproduces."""
    m, v = model_and_vars
    n = 7
    frames = _frames(rng, n)
    step = jax.jit(make_step(m, v, DISTANCE))
    state = init_state(m, v, frames[0], DISTANCE)

    emitted = {}
    for t in range(n):
        state, (hm, kf_bb) = step(state, frames[t])
        key_t = t - (DISTANCE - 1)
        if key_t >= 0:
            emitted[key_t] = (np.asarray(hm), np.asarray(kf_bb))

    for key_t in range(n - (DISTANCE - 1)):
        kf, sup = _clip_inputs(frames, key_t)
        ref_hm, ref_kf_bb = m.apply(v, kf, sup, train=False)
        got_hm, got_kf_bb = emitted[key_t]
        # the jitted step is one fused graph; XLA's fusion choices round
        # differently from the eager oracle at f32-epsilon level (the
        # op-by-op composition above IS bitwise)
        np.testing.assert_allclose(np.asarray(ref_hm), got_hm, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(ref_kf_bb), got_kf_bb, atol=1e-5
        )


def test_streaming_flip_test_mode(model_and_vars, rng):
    """flip_test=True averages with the flipped-window head pass, matching
    the batch pipeline's flip-test combination."""
    from fami_pose_tpu.data.keypoints import COCO_FLIP_PAIRS
    from fami_pose_tpu.ops.pose import flip_back_nhwc

    m, v = model_and_vars
    n = 5
    frames = _frames(rng, n)
    step = jax.jit(make_step(m, v, DISTANCE, flip_test=True))
    state = init_state(m, v, frames[0], DISTANCE, flip_test=True)
    for t in range(n):
        state, (hm, _) = step(state, frames[t])

    key_t = n - (DISTANCE - 1) - 1
    kf, sup = _clip_inputs(frames, key_t)
    ref, _ = m.apply(v, kf, sup, train=False)
    ref_f, _ = m.apply(
        v, kf[:, :, ::-1, :], sup[:, :, ::-1, :], train=False
    )
    want = (ref + flip_back_nhwc(ref_f, COCO_FLIP_PAIRS)) * 0.5
    np.testing.assert_allclose(np.asarray(hm), np.asarray(want), atol=1e-5)


def test_flip_batched_matches_paired(model_and_vars, rng):
    """The 2B-batched flip-test step == the two-call paired form (eval-mode
    BN is batch-size independent, so folding flipped frames into the same
    backbone/head calls changes only dispatch; XLA refuses different
    batch sizes the same fusion schedule, so agreement is to f32 rounding,
    not bitwise)."""
    m, v = model_and_vars
    n = 4
    frames = _frames(rng, n)
    step_b = jax.jit(make_step(m, v, DISTANCE, flip_test=True,
                               flip_batched=True))
    step_p = jax.jit(make_step(m, v, DISTANCE, flip_test=True,
                               flip_batched=False))
    st_b = init_state(m, v, frames[0], DISTANCE, flip_test=True)
    st_p = init_state(m, v, frames[0], DISTANCE, flip_test=True)
    for t in range(n):
        st_b, (hm_b, kf_b) = step_b(st_b, frames[t])
        st_p, (hm_p, kf_p) = step_p(st_p, frames[t])
    np.testing.assert_allclose(
        np.asarray(hm_b), np.asarray(hm_p), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(kf_b), np.asarray(kf_p), atol=5e-6
    )


def test_sharded_streaming_matches_single(model_and_vars, rng):
    """B=8 streams sharded over the 8-device mesh == the single-device step
    (the step is elementwise across streams: no collectives, same values)."""
    from fami_pose_tpu.parallel.mesh import build_mesh

    m, v = model_and_vars
    n, b8 = 4, 8
    frames = jnp.asarray(rng.rand(n, b8, H, W, 3).astype(np.float32))
    mesh = build_mesh()
    step_m = make_step(m, v, DISTANCE, mesh=mesh)
    step_1 = jax.jit(make_step(m, v, DISTANCE))
    st_m = init_state(m, v, frames[0], DISTANCE, mesh=mesh)
    st_1 = init_state(m, v, frames[0], DISTANCE)
    for t in range(n):
        st_m, (hm_m, kf_m) = step_m(st_m, frames[t])
        st_1, (hm_1, kf_1) = step_1(st_1, frames[t])
    # per-device subgraphs fuse like the single-device one: f32-epsilon
    np.testing.assert_allclose(
        np.asarray(hm_m), np.asarray(hm_1), atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(kf_m), np.asarray(kf_1), atol=5e-6
    )


def test_predictor_wrapper(model_and_vars, rng):
    m, v = model_and_vars
    frames = _frames(rng, 4)
    pred = StreamingPosePredictor(m, v, distance=DISTANCE)
    pred.prime(frames[0])
    for t in range(4):
        hm, kf_bb = pred(frames[t])
    assert hm.shape[0] == B and kf_bb.shape[0] == B
    assert np.isfinite(np.asarray(hm, dtype=np.float32)).all()


def test_init_from_history_matches_virgin_stream(model_and_vars, rng):
    """Re-priming from the full window of real frames reconstructs exactly
    the state a from-scratch stream holds: subsequent emissions are equal."""
    from fami_pose_tpu.engine.streaming import init_state_from_history

    m, v = model_and_vars
    n = 8
    w = 2 * DISTANCE - 1
    frames = _frames(rng, n)
    step = jax.jit(make_step(m, v, DISTANCE))

    # virgin stream over all frames
    st_a = init_state(m, v, frames[0], DISTANCE)
    outs_a = []
    for t in range(n):
        st_a, (hm, _) = step(st_a, frames[t])
        outs_a.append(np.asarray(hm))

    # re-primed at time t0 = w - 1 from the last w frames (full history)
    t0 = w - 1
    st_b = init_state_from_history(m, v, frames[: t0 + 1], DISTANCE)
    for t in range(t0 + 1, n):
        st_b, (hm, _) = step(st_b, frames[t])
        # the buffers hold identical frames -> identical emissions
        np.testing.assert_allclose(np.asarray(hm), outs_a[t], atol=1e-5)


def test_init_from_history_partial_clamps_then_converges(model_and_vars, rng):
    """T < window re-prime clamps missing slots to the oldest frame and
    matches the virgin stream once clamped slots leave the window."""
    from fami_pose_tpu.engine.streaming import init_state_from_history

    m, v = model_and_vars
    n = 9
    w = 2 * DISTANCE - 1
    frames = _frames(rng, n)
    step = jax.jit(make_step(m, v, DISTANCE))

    st_a = init_state(m, v, frames[0], DISTANCE)
    outs_a = []
    for t in range(n):
        st_a, (hm, _) = step(st_a, frames[t])
        outs_a.append(np.asarray(hm))

    # re-prime at t0 = 4 with only the last T=2 frames (3, 4)
    t0, t_hist = 4, 2
    st_b = init_state_from_history(
        m, v, frames[t0 - t_hist + 1 : t0 + 1], DISTANCE
    )
    for t in range(t0 + 1, n):
        st_b, (hm, _) = step(st_b, frames[t])
        if t - t0 >= w - t_hist:  # all clamped slots overwritten
            np.testing.assert_allclose(np.asarray(hm), outs_a[t], atol=1e-5)


def test_predictor_prime_from_history(model_and_vars, rng):
    m, v = model_and_vars
    frames = _frames(rng, 6)
    p = StreamingPosePredictor(m, v, distance=DISTANCE, flip_test=True)
    p.prime_from_history(frames[:3])
    hm, kf = p(frames[3])
    assert hm.shape == kf.shape and np.isfinite(np.asarray(hm)).all()


def test_box_iou_cs_values():
    from fami_pose_tpu.engine.streaming import box_iou_cs

    c = np.array([[100.0, 100.0], [100.0, 100.0], [100.0, 100.0]])
    s = np.array([[0.5, 0.5]] * 3)  # 100x100 boxes
    c2 = np.array([[100.0, 100.0], [150.0, 100.0], [300.0, 300.0]])
    iou = box_iou_cs(c, s, c2, s)
    np.testing.assert_allclose(iou[0], 1.0)
    np.testing.assert_allclose(iou[1], 50.0 / 150.0, rtol=1e-6)  # half overlap
    np.testing.assert_allclose(iou[2], 0.0)


def test_merge_stream_states_per_stream_bitwise(model_and_vars, rng):
    """Per-stream re-prime: the untriggered stream's subsequent emissions
    must equal a never-re-primed run BITWISE; the triggered stream must
    equal a fully-re-primed run."""
    from fami_pose_tpu.engine.streaming import (
        init_state_from_history,
        merge_stream_states,
    )

    m, v = model_and_vars
    n = 9
    frames = _frames(rng, n)
    # "re-cropped" history for the moved stream: different pixel content
    frames_new = _frames(np.random.RandomState(123), n)
    step = jax.jit(make_step(m, v, DISTANCE))

    # reference A: never re-primed
    st_a = init_state(m, v, frames[0], DISTANCE)
    outs_a = []
    for t in range(n):
        st_a, (hm, _) = step(st_a, frames[t])
        outs_a.append(np.asarray(hm))

    # reference B: all streams re-primed at t0 from the new crops
    t0, t_hist = 4, 3
    hist_new = frames_new[t0 - t_hist + 1 : t0 + 1]
    st_b = init_state_from_history(m, v, hist_new, DISTANCE)
    outs_b = []
    for t in range(t0 + 1, n):
        st_b, (hm, _) = step(st_b, frames_new[t])
        outs_b.append(np.asarray(hm))

    # merged: stream 0 keeps its ongoing state, stream 1 re-primes
    st_m = init_state(m, v, frames[0], DISTANCE)
    for t in range(t0 + 1):
        st_m, _ = step(st_m, frames[t])
    new = init_state_from_history(m, v, hist_new, DISTANCE)
    st_m = merge_stream_states(st_m, new, np.array([False, True]))
    for i, t in enumerate(range(t0 + 1, n)):
        mixed = jnp.concatenate(
            [frames[t, :1], frames_new[t, 1:]], axis=0
        )
        st_m, (hm, _) = step(st_m, mixed)
        hm = np.asarray(hm)
        np.testing.assert_array_equal(hm[0], outs_a[t][0])
        np.testing.assert_array_equal(hm[1], outs_b[i][1])


def test_predictor_maybe_reprime_policy(model_and_vars, rng):
    """Box-motion trigger: only the stream whose box IoU vs its locked crop
    drops below the threshold re-primes; locked boxes update for it only."""
    m, v = model_and_vars
    frames = _frames(rng, 6)
    centers0 = np.array([[50.0, 50.0], [50.0, 50.0]], np.float32)
    scales0 = np.array([[0.4, 0.4], [0.4, 0.4]], np.float32)
    p = StreamingPosePredictor(m, v, distance=DISTANCE, reprime_iou=0.6)
    p.prime(frames[0], centers=centers0, scales=scales0)
    for t in range(1, 4):
        p(frames[t])

    # stream 0 static, stream 1 moved far
    centers1 = np.array([[50.0, 50.0], [90.0, 50.0]], np.float32)
    mask = p.maybe_reprime(centers1, scales0, history=frames[1:4])
    np.testing.assert_array_equal(mask, [False, True])
    np.testing.assert_allclose(p._locked_center[0], centers0[0])
    np.testing.assert_allclose(p._locked_center[1], centers1[1])
    hm, kf = p(frames[4])
    assert np.isfinite(np.asarray(hm)).all()

    # below-threshold motion does not trigger
    centers2 = np.array([[51.0, 50.0], [90.0, 50.0]], np.float32)
    mask2 = p.maybe_reprime(centers2, scales0, history=frames[2:5])
    np.testing.assert_array_equal(mask2, [False, False])

    # trigger disabled -> never re-primes
    q = StreamingPosePredictor(m, v, distance=DISTANCE)
    q.prime(frames[0], centers=centers0, scales=scales0)
    assert not q.boxes_moved(centers1, scales0).any()
