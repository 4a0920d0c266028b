"""Profiling / tracing hooks — a capability the reference lacks entirely
(SURVEY.md §5 "Tracing/profiling: absent").

``trace`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard/Perfetto); ``StepTimer`` measures steady-state step time with
device synchronisation and exposes simple throughput stats.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/sr3d_tpu_trace"):
    """jax.profiler trace context: ``with trace('logs/trace'): step(...)``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the TPU timeline)."""
    return jax.profiler.TraceAnnotation(name)


@dataclass
class StepTimer:
    """Wall-clock step timing with warmup discard and items/sec."""
    warmup: int = 2
    _times: list = field(default_factory=list)
    _t0: float | None = None
    _count: int = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, sync_on=None) -> float:
        if sync_on is not None:
            jax.block_until_ready(sync_on)
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    def items_per_sec(self, items_per_step: int) -> float:
        return items_per_step / self.mean if self.mean else 0.0
