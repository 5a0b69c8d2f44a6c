"""Profiling and tracing hooks (SURVEY §5: the reference has none beyond a
wall-clock s/step print, src/dwm/pipelines/ctsd.py:1157-1187; jax.profiler
traces are nearly free on TPU, so the rebuild makes them first-class).

Usage:
    with trace_if("/out/profile", step in range(100, 103)):
        state, metrics = pipeline.train_step(...)

    with annotate("denoise_loop"):
        ...

Traces are written in the TensorBoard profile plugin format; open with
``tensorboard --logdir {output}/profile`` (xprof) or feed to
``jax.profiler`` tooling.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the duration of the block."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def trace_if(log_dir: str, enabled: bool) -> Iterator[None]:
    if not enabled:
        yield
        return
    with trace(log_dir):
        yield


def annotate(name: str):
    """Named region visible in profiler timelines AND in XLA HLO metadata
    (jax.named_scope applies to traced computations; TraceAnnotation covers
    the host-side span)."""
    return jax.named_scope(name)


class StepTimer:
    """Rolling wall-clock step statistics (the reference's ``s/step`` print,
    ctsd.py:1170, kept as structured values)."""

    def __init__(self, window: int = 20):
        self.window = window
        self.durations: list[float] = []
        self._t0: Optional[float] = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.durations.append(dt)
        if len(self.durations) > 10 * self.window:
            self.durations = self.durations[-self.window:]
        return dt

    @property
    def mean(self) -> float:
        if not self.durations:
            return 0.0
        recent = self.durations[-self.window:]
        return sum(recent) / len(recent)


def device_memory_stats() -> dict:
    """Per-device memory telemetry when the backend exposes it."""
    stats = {}
    for i, d in enumerate(jax.local_devices()):
        try:
            s = d.memory_stats()
        except Exception:
            continue
        if not s:
            continue
        stats[f"device{i}/bytes_in_use"] = s.get("bytes_in_use", 0)
        stats[f"device{i}/peak_bytes_in_use"] = s.get(
            "peak_bytes_in_use", 0
        )
    return stats
