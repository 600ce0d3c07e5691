"""Metric logging surface: JSONL always, TensorBoard when available.

Replaces the reference's tensorboardX writer (``alignment_mi_function_
term6_1.py:212-220``, ``trainer.py:83-89``) with a backend that cannot be a
hard dependency: every scalar goes to ``metrics.jsonl`` in the log dir, and
to TensorBoard via ``torch.utils.tensorboard`` when importable.
"""

import json
import os
import os.path as osp
import time


class MetricWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.path = osp.join(log_dir, "metrics.jsonl")
        self._f = open(self.path, "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int):
        rec = {"tag": tag, "value": float(value), "step": int(step),
               "time": time.time()}
        self._f.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), int(step))

    def flush(self):
        self._f.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self):
        self.flush()
        self._f.close()
        if self._tb is not None:
            self._tb.close()
