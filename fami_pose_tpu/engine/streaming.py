"""Streaming serving: per-frame backbone features cached across windows.

The reference's eval protocol (``Alignment_V15.py:113-122`` +
``PoseTrack_Alignment.py:311-359``) runs the full backbone on all
``1 + num_sup`` frames of every clip. In video serving, consecutive key
frames share ``num_sup`` of those frames: with DISTANCE=3 each video frame
appears in up to 5 sliding windows, so per-keyframe the reference recomputes
5 backbone passes where steady-state streaming needs ONE. Measured on v5e
(tools/bench_backbone_alone.py) the int8 backbone is 54%+ of the eval
forward, so caching is worth ~2x end-to-end.

This module implements that serving architecture for ``B`` parallel video
streams: a rolling on-device feature buffer spanning the temporal window and
one jitted step per frame-advance that

  1. runs the backbone ONCE on the ``B`` new frames (``mode="features"``),
  2. shifts the rolling buffer,
  3. gathers the window in the dataset's fold order and runs the alignment
     head (``mode="head"``) for the window's key frame.

Numerics: the head consumes cached features bitwise-identical to the ones the
full forward would compute, so a steady-state streaming step equals the full
forward *when every frame of the window was cropped with the same affine*
("crop-locked" serving — the person box is held fixed while a window spans
it). The reference's batch protocol instead re-crops all 5 frames with each
key frame's box (``PoseTrack_Alignment.py:116-126``), so cross-window reuse
is exact only while the box is static; a deployed tracker re-crops (and
re-primes the stream) when the box moves materially. Boundary key frames
(first/last ``distance-1`` of a stream) also differ slightly: the dataset
pads missing neighbors with the key frame itself (delta-0 padding,
``support_frame_deltas``), while the primed buffer clamps to the first frame.
Steady-state interior frames under a fixed crop are exact — the op-by-op
features->head composition is asserted *bitwise* in
``tests/test_streaming.py``; the fully-jitted step matches the eager oracle
to f32-epsilon (XLA fusion rounding only).

Latency: the step fed frame ``t`` emits the heatmap for key frame
``t - (distance - 1)`` (the window needs ``distance - 1`` future frames,
exactly like the offline protocol).
"""

from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from fami_pose_tpu.data.keypoints import COCO_FLIP_PAIRS
from fami_pose_tpu.ops.pose import flip_back_nhwc


class StreamState(NamedTuple):
    """Circular window buffers for B parallel streams.

    ``pos`` is the slot the NEXT step writes; frame ``t - k`` lives at slot
    ``(pos - 1 - k) mod W`` after the step that consumed frame ``t``. A
    circular buffer beats the shift form (concat of ``buf[1:]`` + new) by
    ~340 MB of HBM copies per step at W48 scale: one 85 MB slot write
    instead of rewriting the whole feature buffer (measured ~8 ms/step of
    pure copy at batch 128)."""

    feats: jnp.ndarray  # (W, B, Hf, Wf, C) stage-2 backbone features
    bb_hms: jnp.ndarray  # (W, B, Hh, Wh, J) backbone heatmaps
    pos: jnp.ndarray  # () int32 — next write slot
    feats_f: Optional[jnp.ndarray] = None  # flipped-frame features (flip_test)


def window_order(distance: int) -> List[int]:
    """Buffer-slot read order ``[key, sup...]`` matching the dataset fold:
    prev sups farthest-first, then next sups nearest-first
    (``data/posetrack.support_frame_deltas``)."""
    k = distance - 1
    prev = [k - d for d in range(distance - 1, 0, -1)]
    nxt = [k + d for d in range(1, distance)]
    return [k] + prev + nxt


def init_state(model, variables, first_frames, distance: int,
               flip_test: bool = False, mesh=None) -> StreamState:
    """Prime the rolling buffer by replicating the first frame's features
    into every slot (clamp-to-first boundary; see module docstring).
    With ``mesh`` the primed buffers are placed stream-sharded over the
    data axis (:func:`stream_shardings`)."""
    bb_hm, feat = model.apply(
        variables, first_frames, None, train=False, mode="features"
    )
    w = 2 * distance - 1
    state = StreamState(
        feats=jnp.tile(feat[None], (w, 1, 1, 1, 1)),
        bb_hms=jnp.tile(bb_hm[None], (w, 1, 1, 1, 1)),
        pos=jnp.int32(0),
    )
    if flip_test:
        _, feat_f = model.apply(
            variables, first_frames[:, :, ::-1, :], None,
            train=False, mode="features",
        )
        state = state._replace(feats_f=jnp.tile(feat_f[None], (w, 1, 1, 1, 1)))
    if mesh is not None:
        state_sh, _ = stream_shardings(mesh, flip_test=flip_test)
        state = jax.device_put(state, state_sh)
    return state


def init_state_from_history(model, variables, history, distance: int,
                            flip_test: bool = False, mesh=None) -> StreamState:
    """Prime the rolling buffer from real frame history — the re-prime path
    a deployed tracker uses when a stream's crop box moves materially (the
    module docstring's crop-locked condition breaks and cached features
    under the old crop are stale).

    ``history`` is ``(T, B, H, W, 3)``, oldest first, ``1 <= T <= 2*distance
    - 1`` — the last ``T`` frames re-cropped under the NEW box. Slots older
    than the history clamp to the oldest frame (the same convention
    :func:`init_state` applies with ``T = 1``). The resulting state is
    exactly the state a stream fed those frames from scratch would hold
    (eval-mode BN is per-sample, so folding ``T`` into the batch axis of one
    backbone call computes the same features), so subsequent emissions match
    a never-re-primed stream as soon as clamped slots leave the window.
    """
    w = 2 * distance - 1
    t_n, b = int(history.shape[0]), int(history.shape[1])
    if not 1 <= t_n <= w:
        raise ValueError(f"history length {t_n} not in [1, {w}]")
    flat = history.reshape((t_n * b,) + tuple(history.shape[2:]))
    bb_hm, feat = model.apply(variables, flat, None, train=False,
                              mode="features")
    feat = feat.reshape((t_n, b) + tuple(feat.shape[1:]))
    bb_hm = bb_hm.reshape((t_n, b) + tuple(bb_hm.shape[1:]))
    # slot i holds padded[i] = history[max(i - (w - T), 0)]; pos = 0 so the
    # next write overwrites the oldest slot — frame t-k sits at slot
    # (pos - 1 - k) mod w = w - 1 - k, the newest-last layout the step reads
    idx = jnp.maximum(jnp.arange(w) - (w - t_n), 0)
    state = StreamState(feats=feat[idx], bb_hms=bb_hm[idx], pos=jnp.int32(0))
    if flip_test:
        _, feat_f = model.apply(
            variables, flat[:, :, ::-1, :], None, train=False,
            mode="features",
        )
        feat_f = feat_f.reshape((t_n, b) + tuple(feat_f.shape[1:]))
        state = state._replace(feats_f=feat_f[idx])
    if mesh is not None:
        state_sh, _ = stream_shardings(mesh, flip_test=flip_test)
        state = jax.device_put(state, state_sh)
    return state


def box_iou_cs(center_a, scale_a, center_b, scale_b,
               pixel_std: float = 200.0) -> np.ndarray:
    """Per-stream IoU between two (center, scale)-parameterized boxes.

    Host-side (tracker boxes live on the host). centers (B, 2), scales
    (B, 2) in the dataset's scale*pixel_std convention (``utils/bbox``)."""
    ca, sa = np.asarray(center_a, np.float64), np.asarray(scale_a, np.float64)
    cb, sb = np.asarray(center_b, np.float64), np.asarray(scale_b, np.float64)
    wa, wb = sa * pixel_std, sb * pixel_std  # (B, 2) box w/h
    lo = np.maximum(ca - wa / 2, cb - wb / 2)
    hi = np.minimum(ca + wa / 2, cb + wb / 2)
    inter = np.prod(np.maximum(hi - lo, 0.0), axis=-1)
    union = np.prod(wa, axis=-1) + np.prod(wb, axis=-1) - inter
    return inter / np.maximum(union, 1e-12)


def merge_stream_states(old: StreamState, new: StreamState,
                        mask) -> StreamState:
    """Per-stream select between an ongoing state and a freshly (re-)primed
    one: streams where ``mask`` is True take ``new``'s buffers, the rest
    keep ``old``'s.

    The two states index their circular buffers differently (``new`` from
    ``init_state_from_history`` is newest-last with ``pos = 0``), so the old
    buffers are first rotated into that canonical layout — frame ``t - k``
    moves from slot ``(old.pos - 1 - k) mod W`` to slot ``W - 1 - k`` — and
    the merged state restarts at ``pos = 0``. Selection is per-stream (axis
    1), leaving unmoved streams bitwise identical to a never-re-primed run
    (tested in tests/test_streaming.py)."""
    w = int(old.feats.shape[0])
    shift = (w - int(old.pos)) % w
    m = jnp.asarray(mask).reshape(1, -1, 1, 1, 1)

    def sel(new_buf, old_buf):
        return jnp.where(m, new_buf, jnp.roll(old_buf, shift, axis=0))

    feats_f = None
    if old.feats_f is not None:
        feats_f = sel(new.feats_f, old.feats_f)
    return StreamState(
        feats=sel(new.feats, old.feats),
        bb_hms=sel(new.bb_hms, old.bb_hms),
        pos=jnp.int32(0),
        feats_f=feats_f,
    )


def stream_shardings(mesh, flip_test: bool = False):
    """``(state_shardings, frames_sharding)`` for serving ``B`` parallel
    streams data-parallel over ``mesh``: every window buffer is sharded on
    its stream axis (dim 1), ``pos`` replicated, frames on their batch
    axis. The streaming step is elementwise across streams, so the sharded
    step lowers with zero collectives — each chip serves ``B/n_data``
    independent video streams."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fami_pose_tpu.parallel.mesh import DATA_AXIS

    buf = NamedSharding(mesh, P(None, DATA_AXIS))
    rep = NamedSharding(mesh, P())
    frames = NamedSharding(mesh, P(DATA_AXIS))
    state = StreamState(
        feats=buf, bb_hms=buf, pos=rep,
        feats_f=buf if flip_test else None,
    )
    return state, frames


def make_step(model, variables, distance: int, flip_test: bool = False,
              flip_pairs=COCO_FLIP_PAIRS, flip_batched: bool = False,
              mesh=None):
    """Build the (jittable) streaming step.

    ``step(state, frames) -> (state', (final_hm, kf_bb_hm))`` where
    ``frames`` is the next frame of each stream, NHWC ``(B, H, W, 3)``, and
    the outputs correspond to key frame ``t - (distance - 1)``.

    With ``mesh`` the returned step is jitted with the streams sharded over
    the mesh's data axis (see :func:`stream_shardings`) — multi-chip
    serving, B/n_data streams per chip, no cross-chip collectives.

    ``flip_batched`` folds the flipped frames into the SAME backbone/head
    calls (batch ``2B`` instead of two ``B`` calls) — equivalent under
    eval-mode BN (running stats are batch-size independent) up to XLA
    fusion rounding (~1e-6 f32; different batch sizes fuse differently),
    fewer dispatches and inter-op bubbles. Measured on v5e (int8, D=1,
    batch 128): paired 278.7 vs batched 269.0 clips/s — paired is the
    default (tools/bench_streaming_flip.py, docs/SERVING.md).
    """
    lat = distance - 1
    w = 2 * distance - 1
    # fold order relative to the key slot: [0, -lat..-1, +1..+lat]
    rel = [i - lat for i in window_order(distance)]

    def _write(buf, new, pos):
        return jax.lax.dynamic_update_index_in_dim(
            buf, new.astype(buf.dtype), pos, 0
        )

    def _fold(buf, key_slot):
        return jnp.concatenate(
            [
                jax.lax.dynamic_index_in_dim(
                    buf, jnp.mod(key_slot + r, w), 0, keepdims=False
                )
                for r in rel
            ],
            axis=0,
        )

    def step(state: StreamState, frames) -> Tuple[StreamState, Tuple]:
        pos = state.pos
        key_slot = jnp.mod(pos - lat, w)
        b = frames.shape[0]
        if flip_test and flip_batched:
            # one 2B backbone call over [frames; flipped frames] and one
            # (1+num_sup)*2B head call: bit-equivalent to the paired form
            # (eval-mode BN uses running stats), fewer dispatches
            both = jnp.concatenate([frames, frames[:, :, ::-1, :]], axis=0)
            bb_hm2, feat2 = model.apply(
                variables, both, None, train=False, mode="features"
            )
            feats = _write(state.feats, feat2[:b], pos)
            feats_f = _write(state.feats_f, feat2[b:], pos)
            bb_hms = _write(state.bb_hms, bb_hm2[:b], pos)
            kf_bb = jax.lax.dynamic_index_in_dim(
                bb_hms, key_slot, 0, keepdims=False
            )
            fold_n = _fold(feats, key_slot)  # ((1+S)*B, ...)
            fold_f = _fold(feats_f, key_slot)
            # interleave to the fold layout of a 2B batch: [key(2B), sup1(2B)...]
            s1 = len(rel)  # 1 + num_sup window frames
            fold2 = jnp.concatenate(
                [
                    jnp.concatenate(
                        [fold_n[i * b : (i + 1) * b], fold_f[i * b : (i + 1) * b]],
                        axis=0,
                    )
                    for i in range(s1)
                ],
                axis=0,
            )
            kf_bb2 = jnp.concatenate([kf_bb, kf_bb], axis=0)
            final2, _ = model.apply(
                variables, fold2, kf_bb2, train=False, mode="head"
            )
            final = (
                final2[:b] + flip_back_nhwc(final2[b:], flip_pairs)
            ) * 0.5
            return (
                StreamState(feats, bb_hms, jnp.mod(pos + 1, w), feats_f),
                (final, kf_bb),
            )
        bb_hm, feat = model.apply(
            variables, frames, None, train=False, mode="features"
        )
        feats = _write(state.feats, feat, pos)
        bb_hms = _write(state.bb_hms, bb_hm, pos)
        kf_bb = jax.lax.dynamic_index_in_dim(
            bb_hms, key_slot, 0, keepdims=False
        )
        final, _ = model.apply(
            variables, _fold(feats, key_slot), kf_bb, train=False, mode="head"
        )
        feats_f = state.feats_f
        if flip_test:
            _, feat_f = model.apply(
                variables, frames[:, :, ::-1, :], None,
                train=False, mode="features",
            )
            feats_f = _write(state.feats_f, feat_f, pos)
            final_f, _ = model.apply(
                variables, _fold(feats_f, key_slot), kf_bb,
                train=False, mode="head",
            )
            final = (final + flip_back_nhwc(final_f, flip_pairs)) * 0.5
        return (
            StreamState(feats, bb_hms, jnp.mod(pos + 1, w), feats_f),
            (final, kf_bb),
        )

    if mesh is None:
        return step
    state_sh, frames_sh = stream_shardings(mesh, flip_test=flip_test)
    from jax.sharding import NamedSharding, PartitionSpec as P

    from fami_pose_tpu.parallel.mesh import DATA_AXIS

    out_sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step,
        in_shardings=(state_sh, frames_sh),
        out_shardings=(state_sh, (out_sh, out_sh)),
    )


class StreamingPosePredictor:
    """Stateful convenience wrapper: one object per fleet of B streams.

    >>> pred = StreamingPosePredictor(model, variables, distance=3)
    >>> pred.prime(first_frames)            # frame 0 of each stream
    >>> hm, kf_bb = pred(next_frames)       # per new frame

    Crop-locked serving is exact only while the person box is static
    (module docstring); ``reprime_iou`` adds the automatic box-motion
    trigger: pass each frame's tracker boxes to :meth:`maybe_reprime` and
    streams whose current box IoU against their LOCKED crop box drops below
    the threshold are re-primed from re-cropped history, per stream (other
    streams' buffers stay bitwise untouched). The threshold default comes
    from the trained-weights drift A/B (tools/streaming_ab.py,
    docs/STREAMING_AB.md)."""

    def __init__(self, model, variables, distance: int = 3,
                 flip_test: bool = False, flip_batched: bool = False,
                 mesh=None, reprime_iou: float = 0.0):
        self.distance = distance
        self.flip_test = flip_test
        self.reprime_iou = float(reprime_iou)  # 0 disables the trigger
        self._model = model
        self._variables = variables
        self._mesh = mesh
        step = make_step(model, variables, distance, flip_test=flip_test,
                         flip_batched=flip_batched, mesh=mesh)
        self._step = step if mesh is not None else jax.jit(step)
        self._state = None
        self._locked_center = None
        self._locked_scale = None

    def prime(self, first_frames, centers=None, scales=None):
        self._state = init_state(
            self._model, self._variables, first_frames, self.distance,
            flip_test=self.flip_test, mesh=self._mesh,
        )
        self._lock_boxes(centers, scales)

    def prime_from_history(self, history, centers=None, scales=None):
        """Re-prime ALL streams from the last ``T <= 2*distance-1`` frames
        (oldest first, ``(T, B, H, W, 3)``) — e.g. re-cropped under moved
        boxes; see :func:`init_state_from_history`."""
        self._state = init_state_from_history(
            self._model, self._variables, history, self.distance,
            flip_test=self.flip_test, mesh=self._mesh,
        )
        self._lock_boxes(centers, scales)

    def _lock_boxes(self, centers, scales):
        if centers is not None:
            self._locked_center = np.array(centers, np.float32)
            self._locked_scale = np.array(scales, np.float32)

    def boxes_moved(self, centers, scales) -> np.ndarray:
        """Bool mask of streams whose current box IoU vs the locked crop box
        fell below ``reprime_iou`` (all-False when the trigger is off or no
        boxes were locked)."""
        if self.reprime_iou <= 0.0 or self._locked_center is None:
            return np.zeros(len(np.atleast_2d(centers)), bool)
        iou = box_iou_cs(
            self._locked_center, self._locked_scale, centers, scales
        )
        return iou < self.reprime_iou

    def maybe_reprime(self, centers, scales, history) -> np.ndarray:
        """Apply the box-motion policy: re-prime exactly the streams whose
        box moved past the threshold, from ``history`` (``(T, B, H, W, 3)``,
        oldest first, frames re-cropped under the NEW boxes — only the
        triggered streams' columns are consumed). Returns the mask.

        ``history`` must hold the frames ALREADY FED — the last ``T`` step
        inputs up to and including the PREVIOUS step's — re-cropped under
        the new boxes. Including the frame about to be fed would insert it
        twice and shift every later emission by one frame (the off-by-one
        measured at -8 AP on the jitter fixture, tools/streaming_ab.py).

        ``centers``/``scales`` should be the tracker box at the EMISSION
        HORIZON — the keyframe about to be emitted (the frame fed
        ``distance - 1`` steps ago) — not the newest frame's box. The
        batch protocol crops every window frame under the KEYFRAME's box;
        re-priming under the newest box pins each emission ``distance-1``
        frames behind its crop, a systematic offset that GROWS with the
        re-prime rate (measured on the drift fixture: -61 AP at rate 0.7
        vs -29 at rate 0.2 before the convention was fixed —
        docs/STREAMING_AB.md)."""
        mask = self.boxes_moved(centers, scales)
        if mask.any():
            new = init_state_from_history(
                self._model, self._variables, history, self.distance,
                flip_test=self.flip_test, mesh=self._mesh,
            )
            self._state = merge_stream_states(self._state, new, mask)
            self._locked_center[mask] = np.asarray(centers, np.float32)[mask]
            self._locked_scale[mask] = np.asarray(scales, np.float32)[mask]
        return mask

    def __call__(self, frames):
        assert self._state is not None, "call prime(first_frames) first"
        self._state, out = self._step(self._state, frames)
        return out
