"""Tracing and profiling hooks (the framework's observability layer).

The reference has only wall-clock segmentation of forward/track time
(mot_evaluator.py:115-117, 177-189; CenterTrack's per-stage timing dict,
detector.py:160-182).  This module provides the TPU-native equivalents:

- ``StageTimer``: per-stage wall timing with optional device sync, the
  per-frame breakdown (detect / crop / associate / assign / bookkeeping).
- ``trace``: context manager around the JAX profiler, producing a
  TensorBoard-loadable trace of XLA execution.
- ``log_compile_times``: enables jax's compilation logging for finding
  recompile storms (the bucketing regressions this framework must avoid).
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Accumulates per-stage wall time.

    Example::

        timer = StageTimer(sync=True)
        with timer("reid"):
            feats = model(...)
        print(timer.summary())
    """

    def __init__(self, sync: bool = False):
        self.sync = sync
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str):
        if self.sync:
            self._block()
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync:
                self._block()
            self.totals[stage] += time.perf_counter() - t0
            self.counts[stage] += 1

    @staticmethod
    def _block():
        import jax

        # flush pending work on the default device
        jax.block_until_ready(jax.numpy.zeros(()))

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "calls": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in sorted(self.totals)
        }

    def report(self) -> str:
        lines = []
        for k, v in self.summary().items():
            lines.append(
                f"{k:20s} {v['total_s']:8.3f}s total  "
                f"{v['mean_ms']:8.2f}ms/call  x{v['calls']}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str, host_traces: bool = True):
    """JAX profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(logdir, create_perfetto_link=False)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def log_compile_times(enable: bool = True):
    """Log every XLA compilation (catches shape-churn recompiles)."""
    logger = logging.getLogger("jax._src.dispatch")
    logger.setLevel(logging.DEBUG if enable else logging.WARNING)
    import jax

    jax.config.update("jax_log_compiles", enable)
