"""Tracing/profiling helpers (SURVEY.md §5: the reference has only tqdm bars and
ad-hoc wall-clock prints, src/trainers/reconstruct.py:232-236 — the rebuild adds
real device tracing).

- `trace(logdir)`: context manager around `jax.profiler` producing a TensorBoard-
  loadable device trace (XLA op timeline, HBM usage).
- `Timer`: lightweight phase timer with per-phase aggregates, for the trainer
  loops' host-side accounting.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_s": self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name}: {s['total_s']:.2f}s total, {s['count']}x, "
                f"{s['mean_s'] * 1e3:.1f}ms mean"
            )
        return "\n".join(lines)
