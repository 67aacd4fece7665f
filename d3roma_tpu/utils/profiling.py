"""Tracing / profiling helpers.

The reference has no profiling beyond wall-clock prints (SURVEY §5); here
`jax.profiler` traces and a step timer are first-class. Traces open in
TensorBoard or Perfetto."""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict

import jax

logger = logging.getLogger(__name__)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/d3roma_trace"):
    """Capture a jax.profiler trace around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


class StepTimer:
    """Accumulating wall-clock timer for loop phases; blocks on device
    results so device time is attributed to the right phase."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {
            k: self.totals[k] / max(1, self.counts[k]) for k in self.totals
        }

    def log(self):
        for k, v in sorted(self.summary().items()):
            logger.info("phase %-20s %8.2f ms/it (n=%d)", k, v * 1e3, self.counts[k])
