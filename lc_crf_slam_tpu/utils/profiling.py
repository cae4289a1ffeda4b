"""Tracing / profiling utilities (SURVEY.md §6.1).

The reference only had std::chrono medians in its example main; here:
  - StageTimer: per-stage wall-clock accumulation with summary stats
    (reproduces the reference's frames/s reporting),
  - trace(): context manager around jax.profiler for Perfetto/XProf
    traces of the device pipeline.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    """Accumulates wall-clock per named stage; prints median/mean like the
    reference's end-of-run timing block."""

    def __init__(self) -> None:
        self.samples: Dict[str, list] = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, dict]:
        import numpy as np

        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs)
            out[name] = {
                "n": len(xs),
                "median_ms": float(np.median(arr) * 1e3),
                "mean_ms": float(arr.mean() * 1e3),
                "p90_ms": float(np.percentile(arr, 90) * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def report(self) -> str:
        lines = ["stage                  n   median     mean      p90"]
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name:<20} {s['n']:>4} {s['median_ms']:>7.2f}ms "
                f"{s['mean_ms']:>7.2f}ms {s['p90_ms']:>7.2f}ms"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace (view with XProf/Perfetto/TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
