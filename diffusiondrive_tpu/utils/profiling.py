"""Tracing / profiling utilities.

The reference declares pyinstrument but never wires a profiler
(SURVEY §5.1); here profiling is first-class:

- `PhaseTimer`: lightweight named wall-time accounting for host phases
  (IO, feature building, device steps),
- `trace`: context manager around `jax.profiler` producing xprof/TensorBoard
  traces of the on-device programs,
- `annotate`: TraceAnnotation wrapper so host phases show up inside device
  traces.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict
from typing import Dict, Iterator

logger = logging.getLogger(__name__)


class PhaseTimer:
    """Accumulates wall time per named phase; thread-safe enough for CPython."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {"total_s": total, "count": self.counts[name], "mean_ms": 1e3 * total / max(self.counts[name], 1)}
            for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }

    def log_summary(self, prefix: str = "") -> None:
        for name, stats in self.summary().items():
            logger.info("%s%s: %.2fs total, %d calls, %.2fms mean",
                        prefix, name, stats["total_s"], stats["count"], stats["mean_ms"])


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace") -> Iterator[None]:
    """Capture a device trace viewable in xprof/TensorBoard."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)


def annotate(name: str):
    """Named region visible in device traces (host-side annotation)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
