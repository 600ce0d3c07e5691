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


def test_noflip_serving_default_has_recorded_flip_ab():
    """bench.py records a no-flip config-3 mode; the measured flip-test AP
    delta licensing it must be on record."""
    doc = _read("SERVING.md")
    assert re.search(r"flip-vs-noflip AP delta \*\*\+0\.000", doc), (
        "flip-test A/B record missing from docs/SERVING.md — re-run "
        "tools/flip_ab.py --ckpt before serving without flip-test"
    )
    # the caveat must ship with the license
    assert "trained without flip augmentation" in doc


def test_streaming_headline_records_box_motion_cost():
    """The crop-locked streaming headline is exact only for static boxes;
    the measured cost of box motion must be on record next to it."""
    doc = _read("STREAMING_AB.md")
    assert re.search(r"−75\.3|-75\.3", doc), (
        "measured crop-locked AP cost missing from docs/STREAMING_AB.md"
    )
    serving = _read("SERVING.md")
    assert "STREAMING_AB.md" in serving and "maybe_reprime" in serving


def test_reprime_default_guidance_has_recorded_curve():
    """The serving guide recommends reprime_iou=0.9; the measured
    AP-vs-re-prime-rate curve licensing that number must be on record."""
    doc = _read("STREAMING_AB.md")
    assert re.search(r"IoU 0\.9.*\*\*\+0\.00\*\*", doc), (
        "drift-fixture parity row missing — re-run tools/streaming_ab.py "
        "--motion drift --occlude 0.4 before recommending a threshold"
    )
    assert "EMISSION HORIZON" in doc  # the box convention ships with it
