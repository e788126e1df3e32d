"""Per-stage wall-clock timing with device synchronization.

Replaces the reference's dormant TicToc (include/tic_toc.h:10-32, included
but never called — SURVEY.md §5): a context-manager timer that calls
`jax.block_until_ready` so device work is actually measured, plus scans/s
accounting. For deep profiles use `jax.profiler.trace` around a run.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Dict, Optional

import jax


class StageTimer:
    """Accumulates per-stage elapsed seconds and call counts."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._start: Dict[str, float] = {}

    def tic(self, stage: str) -> None:
        self._start[stage] = time.perf_counter()

    def toc(self, stage: str, sync: Any = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._start[stage]
        self.totals[stage] += dt
        self.counts[stage] += 1
        return dt

    class _Ctx:
        def __init__(self, timer, stage, sync_fn):
            self.timer, self.stage, self.sync_fn = timer, stage, sync_fn

        def __enter__(self):
            self.timer.tic(self.stage)
            return self

        def __exit__(self, *exc):
            self.timer.toc(self.stage, self.sync_fn() if self.sync_fn else None)

    def stage(self, name: str, sync_fn=None) -> "_Ctx":
        return StageTimer._Ctx(self, name, sync_fn)

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "total_s": self.totals[k],
                "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1),
            }
            for k in self.totals
        }


def profile_trace(log_dir: str):
    """Context manager wrapping jax.profiler.trace: captures a device trace
    viewable in TensorBoard/Perfetto (the deep-profiling hook the reference
    entirely lacks — SURVEY.md §5 tracing row)."""
    return jax.profiler.trace(log_dir)
