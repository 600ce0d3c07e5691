"""Gates on bench.py's robustness contract (VERDICT r4 #1).

The round-4 driver benchmark timed out with NO JSON record (BENCH_r04.json
rc=124, parsed null) because bench.py printed its one line only after every
mode finished, eagerly re-measured an already-measured mode
(record.setdefault evaluating its default argument), and had no defense
against a 17x mode-level transient. These tests pin the mechanisms that
prevent a recurrence — if someone simplifies them away, the official perf
record is again one transient away from not existing.
"""

import os.path as osp
import re

HERE = osp.dirname(osp.abspath(__file__))
BENCH = osp.join(HERE, "..", "bench.py")


def _src():
    with open(BENCH) as f:
        return f.read()


def test_no_eager_setdefault_measures():
    """record.setdefault(k, measure(...)) evaluates measure() even when k
    is present — the exact waste that burned the r4 driver budget."""
    src = _src()
    assert not re.search(r"setdefault\(\s*[\"'][\w]+[\"'],\s*measure",
                         src), "eager setdefault re-measure reintroduced"


def test_record_emitted_from_finally_under_signal_guards():
    src = _src()
    assert "signal.signal(signal.SIGTERM" in src
    assert "signal.signal(signal.SIGALRM" in src
    assert re.search(r"finally:\s*\n\s*signal\.alarm\(0\)\s*\n\s*emit\(\)",
                     src), "emit() must run from the finally block"
    assert "BENCH_TIME_BUDGET" in src


def test_budget_default_inside_driver_timeout():
    """The r4 driver killed the run somewhere past ~25 min; the self-imposed
    budget must leave margin under that."""
    src = _src()
    m = re.search(
        r'os\.environ\.get\("BENCH_TIME_BUDGET",\s*"(\d+)"\)', src)
    assert m, "BENCH_TIME_BUDGET default missing"
    assert 300 <= int(m.group(1)) <= 1500


def test_required_keys_ordered_before_extras():
    """bf16 parity, the no-flip config-3 pipeline, and the re-prime-
    inclusive rate are the keys the verdict requires in BENCH_r05 — they
    must be attempted before nice-to-have extras so budget exhaustion
    cannot drop them."""
    src = _src()
    order = [
        src.index('("bf16_parity_clips_per_sec"'),
        src.index('("streaming_pipeline_int8_noflip_clips_per_sec"'),
        src.index('("streaming_int8_reprime_clips_per_sec"'),
    ]
    extras = [
        src.index('("pipeline_clips_per_sec"'),
        src.index('("streaming_int8_d4_clips_per_sec"'),
    ]
    assert max(order) < min(extras)


def test_outlier_defense_present():
    src = _src()
    assert "with_outlier_defense" in src
    assert re.search(r"0\.5\s*<=\s*rate\s*/\s*ref\s*<=\s*2\.0", src)


def test_load_prior_reads_last_committed_record():
    import glob
    import json

    import bench

    prior = bench.load_prior()
    # independently find the newest committed record with a parsed payload
    best = None
    for path in glob.glob(osp.join(HERE, "..", "BENCH_r*.json")):
        with open(path) as f:
            rec = json.load(f)
        if isinstance(rec.get("parsed"), dict) and (
            best is None or rec.get("n", 0) > best.get("n", 0)
        ):
            best = rec
    assert best is not None, "no committed BENCH record — outlier defense blind"
    for k, v in best["parsed"].items():
        if k.endswith("_clips_per_sec") and isinstance(v, (int, float)):
            assert prior[k] == float(v), k
    # keys with no committed record keep a builder-measured fallback
    assert all(v > 0 for v in prior.values())


def test_skipped_modes_are_recorded_not_silent():
    src = _src()
    assert 'record["skipped"] = skipped' in src
    assert "skipped.append(key)" in src
