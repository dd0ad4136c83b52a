"""Tracing / profiling (SURVEY.md §5.1).

The reference's only performance tooling is a 10k-forward wall-clock
average (reference test_time.py:1-9) and cudnn.benchmark. Here:

  * `trace(dir)` — context manager around jax.profiler for XLA/TPU traces
    viewable in TensorBoard/Perfetto;
  * `StepTimer` — per-step wall-clock accounting with warmup skip and
    percentile summaries, the generalization of test_time.py.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (jax.profiler.TraceAnnotation)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Wall-clock per-step timer: `with timer.step(): ...`.

    Skips `warmup` steps (compilation), reports mean/p50/p90 and
    items/sec when `items_per_step` is set.
    """

    def __init__(self, warmup: int = 1, items_per_step: Optional[int] = None):
        self.warmup = warmup
        self.items_per_step = items_per_step
        self.times: List[float] = []
        self._seen = 0

    @contextlib.contextmanager
    def step(self):
        t0 = time.perf_counter()
        yield
        dt = time.perf_counter() - t0
        self._seen += 1
        if self._seen > self.warmup:
            self.times.append(dt)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        out = {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(int(n * 0.9), n - 1)],
        }
        if self.items_per_step:
            out["items_per_sec"] = self.items_per_step / out["mean_s"]
        return out
