"""Tracing / profiling utilities.

The reference's observability is wall-clock segment prints
(dataload/np2ts/train, reference train_larva.py:113-139) plus the
`--sleep_ratio` thermal throttle. TPU-native equivalents:

  * `StepTimer` — the same segment breakdown (data / device step /
    other) with running means, printable every log_freq;
  * `trace` — context manager wrapping `jax.profiler.trace` so any run
    can emit a TensorBoard-viewable device trace with
    `--profile_dir <dir>`;
  * `annotate` — `jax.profiler.TraceAnnotation` passthrough for marking
    host-side phases inside the trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator, Optional


class StepTimer:
    """Named-segment wall-clock accounting for the training loop."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._t0: Optional[float] = None
        self._segment: Optional[str] = None

    @contextlib.contextmanager
    def segment(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def mean(self, name: str) -> float:
        c = self.counts[name]
        return self.totals[name] / c if c else 0.0

    def report(self) -> str:
        return ", ".join(
            "%s %.4fs" % (k, self.mean(k)) for k in sorted(self.totals)
        )

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Emit a jax.profiler trace into `profile_dir` when set (no-op
    otherwise). View with TensorBoard's profile plugin or Perfetto."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield


def annotate(name: str):
    """TraceAnnotation context for host-side phase marking."""
    import jax

    return jax.profiler.TraceAnnotation(name)
