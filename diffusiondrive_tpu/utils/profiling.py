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


# --------------------------------------------------------------------------- #
# Trace analysis: attribute device time to model components.
# The methodology behind docs/profiling.md, packaged: capture a trace around
# N launches, join the device timeline's fusion names to the compiled HLO's
# `op_name` metadata, and bucket by module path.
# --------------------------------------------------------------------------- #


def read_device_events(trace_dir: str) -> Dict[str, Dict[str, float]]:
    """Per-instruction device time from the newest trace under `trace_dir`.

    Returns {instruction_name: {"dur_us": total, "count": n}}; empty when the
    platform records no device timeline (e.g. XLA:CPU).
    """
    import glob
    import gzip
    import json

    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        return {}
    with gzip.open(paths[-1]) as f:
        events = json.load(f)["traceEvents"]
    device_pids = {
        e["pid"] for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    out: Dict[str, Dict[str, float]] = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            # purely numeric names are launch/run-id marker spans, not HLO
            # instructions; they cover device-idle gaps (e.g. host fetches
            # through the tunnel) and would swamp the table
            if e["name"].isdigit():
                continue
            row = out.setdefault(e["name"], {"dur_us": 0.0, "count": 0})
            row["dur_us"] += e.get("dur", 0)
            row["count"] += 1
    return out


def op_names_from_hlo(hlo_text: str) -> Dict[str, str]:
    """{instruction_name: op_name metadata} from compiled HLO text."""
    import re

    return {
        m.group(1): m.group(2)
        for m in re.finditer(r'%([\w.\-]+) = [^\n]*?op_name="([^"]+)"', hlo_text)
    }


def _bucket(op_name: str, depth: int = 2) -> str:
    """Module bucket for an op_name like 'jit(f)/Model/backbone/layer1/...'."""
    parts = [p for p in op_name.split("/") if not p.startswith("jit(")]
    # drop the flax module-class root (e.g. DiffusionDriveModel) when present
    if len(parts) > 1 and parts[0][:1].isupper():
        parts = parts[1:]
    return "/".join(parts[:depth]) if parts else "(top)"


def device_time_by_component(
    trace_dir: str, hlo_text: str, launches: int = 1, depth: int = 2
) -> Dict[str, float]:
    """ms of device time per model component per launch, sorted descending."""
    events = read_device_events(trace_dir)
    op_of = op_names_from_hlo(hlo_text)
    totals: Dict[str, float] = defaultdict(float)
    for name, row in events.items():
        if name.startswith("jit_"):  # top-level module event double-counts
            continue
        bucket = _bucket(op_of[name], depth) if name in op_of else "(unattributed)"
        totals[bucket] += row["dur_us"]
    return {
        k: v / launches / 1e3
        for k, v in sorted(totals.items(), key=lambda kv: -kv[1])
    }


def profile_jitted(fn, *args, launches: int = 4, depth: int = 2,
                   trace_dir: str = "/tmp/jax-trace") -> Dict[str, float]:
    """Trace `launches` calls of an already-jitted `fn(*args)` and return the
    per-component device-time table (ms/launch). Fetches ONE leaf of EVERY
    launch's output inside the trace: through the tunnel, un-fetched
    independent executions can be elided outright (bench.py's lesson), and a
    single-element fetch forces the whole program that produced it — while
    fetching *all* leaves would cost one tunnel round-trip per leaf (~45 s of
    device idle per launch on the ~2,900-leaf train state)."""
    import jax
    import numpy as np

    fn(*args)  # warm-up / compile outside the trace
    with trace(trace_dir):
        for _ in range(launches):
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    hlo = fn.lower(*args).compile().as_text()
    return device_time_by_component(trace_dir, hlo, launches=launches, depth=depth)
