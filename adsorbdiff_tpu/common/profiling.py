"""Profiling / tracing hooks.

The reference has no tracing at all — just a CUDA-memory print helper
(ref: adsorbdiff/utils/utils.py:119-126, SURVEY.md §5).  Here: jax.profiler
trace capture around any callable, plus a stage timer whose measurements are
honest on remote-TPU runtimes (data-dependent readback fencing — plain
``block_until_ready`` does not fence execution through the axon tunnel).
"""
from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str = "./profile"):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logging.info(f"profiler trace written to {logdir}")


class StageTimer:
    """Accumulates wall-time per named stage; fence() forces a readback."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, fence_on: Optional[jax.Array] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if fence_on is not None:
                jax.device_get(jax.tree.leaves(fence_on)[0].ravel()[0])
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> str:
        lines = [
            f"{k}: {v:.3f}s total, {v / max(self.counts[k], 1) * 1000:.1f}ms avg ({self.counts[k]}x)"
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)
