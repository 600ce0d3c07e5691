"""MetricWriter (JSONL + optional TB) and profiling hook unit tests."""

import json

import numpy as np

from fami_pose_tpu.engine.metrics_writer import MetricWriter
from fami_pose_tpu.utils.profiling import StepTimer, trace


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.add_scalar("train_loss", 1.5, 0)
    w.add_scalar("train_loss", np.float32(0.75), 10)
    w.close()
    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert [r["value"] for r in recs] == [1.5, 0.75]
    assert [r["step"] for r in recs] == [0, 10]
    assert all(r["tag"] == "train_loss" for r in recs)


def test_metric_writer_appends(tmp_path):
    MetricWriter(str(tmp_path), use_tensorboard=False).close()
    w1 = MetricWriter(str(tmp_path), use_tensorboard=False)
    w1.add_scalar("a", 1, 1)
    w1.close()
    w2 = MetricWriter(str(tmp_path), use_tensorboard=False)
    w2.add_scalar("a", 2, 2)
    w2.close()
    lines = (tmp_path / "metrics.jsonl").read_text().splitlines()
    assert len(lines) == 2  # append, not truncate (resume keeps history)


def test_trace_noop_and_step_timer(tmp_path):
    with trace(None):  # falsy -> no-op
        pass
    t = StepTimer(ema=0.5)
    t.start()
    d1 = t.stop()
    assert t.avg == d1
    t.start()
    d2 = t.stop()
    assert abs(t.avg - (0.5 * d1 + 0.5 * d2)) < 1e-9
