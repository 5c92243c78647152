"""Observability: structured logging, stage timing, device profiling.

The reference has no structured tracing (SURVEY §5 — tqdm bars + ad-hoc
wall-clock prints); this subsystem provides what it lacked:
  - process-0 stream+file logging (the reference's rank-0 logger,
    descriptor_train.py:110-125, generalized);
  - `StageTimer`: accumulated wall-clock per pipeline stage with report();
  - `device_trace`: a context manager around `jax.profiler` traces for
    XLA/TPU timelines viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import logging
import sys
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional

import jax


def setup_logging(
    name: str = "vsc22",
    work_dir: Optional[str] = None,
    level: int = logging.INFO,
    process_index: Optional[int] = None,
) -> logging.Logger:
    """Stream (+ optional file) logging on process 0 only."""
    if process_index is None:
        process_index = jax.process_index()
    logger = logging.getLogger(name)
    logger.setLevel(level)
    logger.handlers.clear()
    if process_index != 0:
        logger.addHandler(logging.NullHandler())
        return logger
    fmt = logging.Formatter("[%(levelname)s: %(asctime)s] %(message)s")
    ch = logging.StreamHandler(stream=sys.stdout)
    ch.setFormatter(fmt)
    logger.addHandler(ch)
    if work_dir:
        import os

        os.makedirs(work_dir, exist_ok=True)
        fh = logging.FileHandler(f"{work_dir}/log.txt")
        fh.setFormatter(fmt)
        logger.addHandler(fh)
    return logger


class StageTimer:
    """Accumulates wall-clock per named stage; `report()` summarizes."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            total = self.totals[name]
            count = self.counts[name]
            lines.append(f"{name}: {total:.3f}s total, {count} calls, {total / count:.4f}s/call")
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, float]:
        return dict(self.totals)


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """jax.profiler trace window (XLA timeline -> TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region inside a device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield
