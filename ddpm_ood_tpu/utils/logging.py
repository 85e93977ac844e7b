"""TensorBoard + stdout logging with rank-0 gating.

Replaces the reference's SummaryWriter pairs (ddpm_trainer.py:23-24) and its
rank!=0 stdout/stderr silencing (base.py:26-29) — here non-zero processes simply
skip writes instead of redirecting file descriptors.
"""

from __future__ import annotations

import functools
from pathlib import Path

import jax


def rank_zero_only(fn):
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if jax.process_index() == 0:
            return fn(*args, **kwargs)
        return None

    return wrapper


class Logger:
    """Lazy tensorboardX SummaryWriter; no-ops on non-zero processes."""

    def __init__(self, log_dir: str | Path):
        self.log_dir = str(log_dir)
        self._writer = None

    @property
    def writer(self):
        if self._writer is None and jax.process_index() == 0:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir=self.log_dir)
        return self._writer

    def add_scalar(self, tag: str, value: float, step: int) -> None:
        w = self.writer
        if w is not None:
            w.add_scalar(tag, float(value), int(step))

    def add_figure(self, tag: str, figure, step: int) -> None:
        w = self.writer
        if w is not None:
            w.add_figure(tag, figure, int(step))

    def flush(self) -> None:
        if self._writer is not None:
            self._writer.flush()


@rank_zero_only
def info(msg: str) -> None:
    print(msg, flush=True)
