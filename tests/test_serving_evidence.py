"""Serving defaults must be backed by recorded evidence (VERDICT r3 #1).

The serving configuration ships three accuracy-affecting levers (int8 PTQ,
DCN window D=1, crop-locked streaming). Each is licensed by a trained-
weights A/B whose results are RECORDED in docs/; these tests gate the
defaults on that record so a lever cannot silently outlive its evidence
(e.g. someone regenerates the docs and drops a table, or flips a default
without re-measuring).
"""

import os.path as osp
import re

import numpy as np
import pytest

HERE = osp.dirname(osp.abspath(__file__))
DOCS = osp.join(HERE, "..", "docs")


def _read(name):
    with open(osp.join(DOCS, name)) as f:
        return f.read()


def test_d1_serving_default_has_recorded_trained_evidence():
    """bench.py's throughput mode uses a D=1 window; the trained-weights
    evidence for what that window does and does not cost must be on record:
    zero delta on the collapsed-offset checkpoints AND the measured AP cost
    on the articulated (alignment-load-bearing) checkpoint, together with
    the D=4 exactness that licenses the auto-window serving policy."""
    with open(osp.join(HERE, "..", "bench.py")) as f:
        bench = f.read()
    m = re.search(
        r'd_int8 = int\(os\.environ\.get\("BENCH_DCN_MAX_OFFSET", "(\d+)"\)\)',
        bench,
    )
    assert m, "bench.py serving window default not found"
    assert int(m.group(1)) == 1
    # the D=1 throughput mode must ship next to the guaranteed-exact-window
    # serving rate, not alone
    assert "streaming_int8_d4_clips_per_sec" in bench

    doc = _read("DCN_OFFSET_BOUND.md")
    assert "TRAINED weights" in doc, "trained-weights rerun section missing"
    # collapsed-offset checkpoints: zero per-joint AP delta at every bound
    assert re.search(
        r"Per-joint AP delta vs exact: 0\.000 at every bound D in "
        r"\{1, 2, 4, 6\}",
        doc,
    ), "recorded zero-delta claim missing — re-run " \
       "tools/ab_dcn_bound_ap.py --ckpt and update the doc"
    # articulated checkpoint: the measured cost of an under-sized window
    # and the exactness of a covering one
    assert re.search(r"−4\.875|-4\.875", doc), (
        "articulated-fixture D=1/D=2 AP cost missing — the D=1 throughput "
        "mode may not ship without its measured worst case on record"
    )
    assert "D must cover the trained offset distribution" in doc


def test_auto_window_policy_is_implemented_and_documented():
    """The per-checkpoint window calibration the articulated A/B forces
    (docs) must exist in code with its config knob."""
    src_path = osp.join(
        HERE, "..", "fami_pose_tpu", "engine", "evaluator.py"
    )
    with open(src_path) as f:
        src = f.read()
    assert "_maybe_auto_window" in src and "DCN_AUTO_WINDOW" in src
    from fami_pose_tpu.config.defaults import get_default_cfg

    cfg = get_default_cfg()
    assert cfg.TPU.DCN_AUTO_WINDOW is False  # opt-in (parity default D stays)
    assert int(cfg.TPU.DCN_AUTO_WINDOW_MAX) >= 6
    assert "DCN_AUTO_WINDOW" in _read("SERVING.md")


def test_flip_default_is_on_and_both_ab_readings_recorded():
    """r4 blessed no-flip from a +0.000 A/B on a checkpoint trained WITHOUT
    flip augmentation at saturated fixture AP; the r5 re-run on a
    flip-TRAINED sub-saturation checkpoint measured **+3.9 AP** and
    reverted the default. Both readings must stay on record (they are the
    evidence that the flip delta is checkpoint-dependent), and the shipped
    serving config must keep flip-test ON."""
    doc = _read("SERVING.md")
    assert re.search(r"\+3\.9\d* (mean )?AP", doc), (
        "r5 flip A/B result missing from docs/SERVING.md — the no-flip "
        "lever's counterexample must be on record"
    )
    assert re.search(r"\+0\.000", doc), (
        "r4 flip A/B reading missing — both readings document the "
        "checkpoint dependence"
    )
    assert "trained without flip augmentation" in doc
    # the shipped serving config must not turn flip off
    yaml_path = osp.join(
        HERE, "..", "configs", "posetrack18", "fami_pose_serving.yaml"
    )
    with open(yaml_path) as f:
        serving_yaml = f.read()
    assert "FLIP: false" not in serving_yaml and \
        "FLIP_VAL: false" not in serving_yaml and \
        "FLIP_TEST: false" not in serving_yaml, (
            "fami_pose_serving.yaml ships no-flip — reverted by the r5 "
            "flip A/B (+3.9 AP); no-flip is per-checkpoint opt-in only"
        )


def test_streaming_headline_records_box_motion_cost():
    """The crop-locked streaming headline is exact only for static boxes;
    the measured cost of box motion must be on record next to it."""
    doc = _read("STREAMING_AB.md")
    assert re.search(r"−75\.3|-75\.3", doc), (
        "measured crop-locked AP cost missing from docs/STREAMING_AB.md"
    )
    serving = _read("SERVING.md")
    assert "STREAMING_AB.md" in serving and "maybe_reprime" in serving


def test_reprime_effective_rate_is_first_class():
    """VERDICT r4 #3: the headline's static-box rate must ship NEXT TO the
    re-prime-inclusive effective rate — bench.py must measure it every run
    and the serving guide must carry the measured economics table."""
    with open(osp.join(HERE, "..", "bench.py")) as f:
        bench = f.read()
    assert "streaming_int8_reprime_clips_per_sec" in bench
    assert "reprime_ms_per_call" in bench
    assert "init_state_from_history" in bench

    serving = _read("SERVING.md")
    assert "Re-prime economics" in serving, (
        "the measured re-prime cost table left docs/SERVING.md — the "
        "crop-locked headline may not ship without it"
    )
    # the two effective-rate anchors (parity point and realistic rate)
    assert re.search(r"0\.70.*283\.6|283\.6.*0\.70", serving, re.S)
    assert re.search(r"0\.10.*539\.2|539\.2.*0\.10", serving, re.S)
    ab = _read("STREAMING_AB.md")
    assert "356.5 ms" in ab, "measured per-re-prime cost missing"


@pytest.mark.slow
def test_window_exactness_claim_rederived_end_to_end(tmp_path):
    """ANCHORED gate (VERDICT r4 weak #5): the other tests in this file pin
    doc TEXT, which catches evidence deletion but not a stale claim — if the
    DCN window semantics drift, the recorded A/B numbers silently stop being
    true. This test RE-DERIVES the mechanism those numbers rest on, per CI
    run, through the real Evaluator on CPU:

      * offsets pinned to 3.3 px (the articulated checkpoint's regime:
        distribution inside D=4, outside D=1 — docs/DCN_OFFSET_BOUND.md);
      * full eval AP at a COVERING window (D=4) must equal the exact
        unbounded gather's AP on every joint (the doc's exactness rows);
      * a window BELOW the distribution (D=1) must actually engage the
        clamp — its heatmaps must differ from exact (the mechanism behind
        the measured −0.65 mean AP cost).

    Runs the windowed XLA path (semantics shared with the Pallas kernels;
    their parity has its own on-chip artifact, docs/PALLAS_ONCHIP_PARITY.md).
    """
    import jax

    from fixtures import make_posetrack_fixture
    from test_auto_window import _evaluator, _init_variables, _pin_offset_heads

    root = str(tmp_path)
    _, img_dir = make_posetrack_fixture(root, n_videos=1, n_frames=4,
                                        people_per_frame=1, seed=5,
                                        draw_joints=True)
    ev = _evaluator(root, img_dir, auto=False)
    ev.model = ev.model.clone(use_pallas_dcn=False)
    variables = _init_variables(ev)
    variables = _pin_offset_heads(variables, 3.3)

    def run(d):
        ev.model = ev.model.clone(dcn_max_offset=d)
        ev.eval_step = ev.core_function.build_eval_step(
            ev.model, mesh=ev.mesh, flip_test=ev._flip_test,
            flip_pairs=ev._flip_pairs,
        )
        res = ev.eval_checkpoint(dict(variables))
        return dict(res["final"][0])

    ap_exact = run(None)  # unbounded gather: the parity anchor
    ap_d4 = run(4)        # covering window
    ap_d1 = run(1)        # below the pinned 3.3 px distribution

    for k in ap_exact:
        assert ap_d4[k] == ap_exact[k], (
            f"covering window D=4 no longer end-to-end AP-exact at {k}: "
            f"{ap_d4[k]} vs {ap_exact[k]} — the DCN_OFFSET_BOUND.md "
            f"exactness rows are STALE, re-run tools/ab_dcn_bound_ap.py"
        )

    # the clamp must engage below the distribution: heatmap-level difference
    # on one eval batch (AP on random weights has no resolving power)
    raw = next(iter(ev.loader))
    kf, sup = ev._prepare(raw)
    ev.model = ev.model.clone(dcn_max_offset=1)
    step1 = ev.core_function.build_eval_step(
        ev.model, mesh=ev.mesh, flip_test=ev._flip_test,
        flip_pairs=ev._flip_pairs,
    )
    ev.model = ev.model.clone(dcn_max_offset=None)
    step_ex = ev.core_function.build_eval_step(
        ev.model, mesh=ev.mesh, flip_test=ev._flip_test,
        flip_pairs=ev._flip_pairs,
    )
    hm1, _ = step1(dict(variables), kf, sup)
    hme, _ = step_ex(dict(variables), kf, sup)
    diff = float(jax.numpy.max(jax.numpy.abs(hm1 - hme)))
    assert diff > 1e-6, (
        "D=1 no longer clamps a 3.3 px offset distribution — the window "
        "semantics changed; every DCN_OFFSET_BOUND.md cost row is STALE"
    )
    assert np.isfinite(list(ap_d1.values())).all()


def test_reprime_default_guidance_has_recorded_curve():
    """The serving guide recommends reprime_iou=0.9; the measured
    AP-vs-re-prime-rate curve licensing that number must be on record."""
    doc = _read("STREAMING_AB.md")
    assert re.search(r"IoU 0\.9.*\*\*\+0\.00\*\*", doc), (
        "drift-fixture parity row missing — re-run tools/streaming_ab.py "
        "--motion drift --occlude 0.4 before recommending a threshold"
    )
    assert "EMISSION HORIZON" in doc  # the box convention ships with it
