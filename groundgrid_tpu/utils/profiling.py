"""Observability: stage timers, running averages, jax profiler hooks.

Replaces the reference's chrono spans + running-average log lines
(``GroundSegmentation.cpp:120-139``, ``GroundGridNodelet.cpp:186-209``) --
insertion / detection / interpolation / classification wall times and the
scans-per-second counter. The jitted pipeline fuses those stages into one
XLA program, so per-stage numbers come either from coarse spans around
blocked calls (:class:`StageTimer`) or from a real device trace
(:func:`trace`), which is the TPU-native equivalent of the reference's
stopwatch logging.
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator

log = logging.getLogger("groundgrid_tpu")


@dataclass
class RunningAverage:
    """avg' = (x + n * avg) / (n + 1), as the reference computes it."""

    count: int = 0
    avg: float = 0.0
    last: float = 0.0
    total: float = 0.0

    def update(self, value: float) -> None:
        self.avg = (value + self.count * self.avg) / (self.count + 1)
        self.count += 1
        self.last = value
        self.total += value


@dataclass
class StageTimer:
    """Named wall-time spans with running averages.

    Usage::

        timer = StageTimer()
        with timer.span("segmentation"):
            ...
        print(timer.report())
    """

    stages: Dict[str, RunningAverage] = field(default_factory=dict)

    @contextlib.contextmanager
    def span(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            ms = (time.perf_counter() - t0) * 1000.0
            self.stages.setdefault(name, RunningAverage()).update(ms)
            log.debug("%s took %.3f ms (avg %.3f ms)", name, ms,
                      self.stages[name].avg)

    def report(self) -> str:
        lines = []
        for name, ra in self.stages.items():
            lines.append(
                f"{name}: last {ra.last:.2f} ms, avg {ra.avg:.2f} ms over {ra.count}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace (xplane) around a block of work.

    The TPU-native replacement for per-stage stopwatches: every fused kernel
    of the pipeline shows up with real device timings. View with tensorboard
    or parse with ``jax.profiler.ProfileData``.
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def jit_device_ms(trace_dir: str, iters: int) -> float:
    """On-device ms per step for the dominant ``jit_*`` executable in a trace.

    Reads the newest ``.xplane.pb`` under ``trace_dir`` and sums TPU-plane
    ``jit_*`` event durations. Returns ``inf`` when the trace yielded no
    file or no TPU events (non-TPU backends, profiler hiccups) so callers
    can fall back to wall probes instead of crashing -- this is the single
    shared implementation behind ``pipeline._probe_device_ms`` and
    ``runtime.bench``.
    """
    import glob

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        return float("inf")
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(paths[-1])
    totals: Dict[str, int] = {}
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                if ev.name.startswith("jit_"):
                    totals[ev.name] = totals.get(ev.name, 0) + ev.duration_ns
    if not totals:
        return float("inf")
    return max(totals.values()) / max(iters, 1) / 1e6


def device_op_times(xplane_path: str, top: int = 25):
    """Aggregate per-op device durations from a captured .xplane.pb file."""
    from jax.profiler import ProfileData

    pd = ProfileData.from_file(xplane_path)
    totals: Dict[str, int] = {}
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            for ev in line.events:
                totals[ev.name] = totals.get(ev.name, 0) + ev.duration_ns
    return sorted(totals.items(), key=lambda kv: -kv[1])[:top]
