"""Profiling hooks (SURVEY §5: the reference has only wall-clock meters;
here: ``jax.profiler`` traces + the same meter surface).

Usage: set ``cfg.TPU.PROFILE_DIR`` (or call ``trace`` directly) to capture a
TensorBoard-viewable trace of the first PROFILE_STEPS train steps.
"""

import contextlib
import logging
import time
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Capture a jax profiler trace into ``log_dir`` (no-op when falsy)."""
    if not log_dir:
        yield
        return
    import jax

    logger = logging.getLogger(__name__)
    try:
        jax.profiler.start_trace(log_dir)
        logger.info(f"profiler trace -> {log_dir}")
        yield
    finally:
        try:
            jax.profiler.stop_trace()
        except Exception as e:  # relayed backends may not support tracing
            logger.warning(f"profiler stop failed: {e}")


class StepTimer:
    """Host-side step timing with EMA; cheap enough to run always."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt
        return dt
