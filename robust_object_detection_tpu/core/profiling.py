"""Profiling and tracing utilities.

The reference's only observability is coarse wall-clock prints
(train_frcnn_baseline.py:160,189 — SURVEY.md §5 "tracing: absent"). Here:

  * :func:`trace` — context manager around ``jax.profiler`` writing a
    TensorBoard-loadable trace directory,
  * :class:`StageTimer` — named-stage wall-clock aggregation with proper
    ``block_until_ready`` fencing (on the axon TPU tunnel, fetch-to-host is
    the only reliable fence — see .claude/skills/verify),
  * :func:`annotate` — ``jax.profiler.TraceAnnotation`` pass-through so
    pipeline stages show up named in the trace viewer.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from pathlib import Path
from typing import Dict, Iterator, Optional


@contextlib.contextmanager
def trace(out_dir: str | Path, enabled: bool = True) -> Iterator[None]:
    """jax.profiler trace around a code block (TensorBoard format)."""
    if not enabled:
        yield
        return
    import jax
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(out_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region for the profiler timeline."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulates wall-clock per named stage; `sync=True` fences the device
    by fetching a tiny value to host before reading the clock."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, fence=None) -> Iterator[None]:
        t0 = time.time()
        try:
            yield
        finally:
            if fence is not None:
                import jax
                leaves = jax.tree.leaves(fence)
                if leaves:
                    jax.device_get(leaves[0].ravel()[0]
                                   if hasattr(leaves[0], "ravel")
                                   else leaves[0])
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {k: {"total_s": round(v, 4),
                    "count": self.counts[k],
                    "mean_ms": round(1e3 * v / max(self.counts[k], 1), 3)}
                for k, v in self.totals.items()}

    def report(self) -> str:
        lines = [f"{k:30s} {v['count']:6d}x  {v['mean_ms']:9.2f} ms  "
                 f"{v['total_s']:9.2f} s"
                 for k, v in sorted(self.summary().items())]
        return "\n".join(lines)
