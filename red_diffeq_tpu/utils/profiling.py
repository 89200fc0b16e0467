"""Profiling and per-step timing hooks.

The reference has no profiling (SURVEY.md §5: only tqdm postfixes). Here:
* :func:`trace` wraps ``jax.profiler.trace`` so any engine run can emit a
  TensorBoard-loadable XPlane trace;
* :class:`StepTimer` records host-side wall-clock per step with a running
  rate, for quick interactive diagnosis without a full trace.
"""
import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Profile the enclosed block to ``log_dir`` (no-op when None)."""
    if log_dir is None:
        yield
        return
    with jax.profiler.trace(str(log_dir)):
        yield


class StepTimer:
    """Wall-clock step timing with warmup exclusion."""

    def __init__(self, skip_first: int = 1):
        self.skip_first = skip_first
        self.times = []
        self._t0 = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.skip_first:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else 0.0

    @property
    def rate(self) -> float:
        return 1.0 / self.mean if self.mean else 0.0

    def summary(self) -> str:
        return (f'{len(self.times)} steps, {self.mean * 1e3:.2f} ms/step '
                f'({self.rate:.2f} steps/s)')
