"""Profiling / observability helpers — the TPU analogue of the reference's
``CUDACallback`` + pytorch_memlab imports (SURVEY.md §5): jax.profiler traces,
per-step wall timing, and device memory stats."""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA over train steps (blocks on the step's outputs)."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg: Optional[float] = None
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, outputs=None) -> float:
        if outputs is not None:
            jax.block_until_ready(outputs)
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else \
            self.ema * self.avg + (1 - self.ema) * dt
        return dt


def device_memory_stats(device: Optional[jax.Device] = None) -> Dict[str, float]:
    """Peak/current HBM usage in MiB (cf. ``main.py:576-596``)."""
    dev = device or jax.local_devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    mib = 1024 ** 2
    return {k: v / mib for k, v in stats.items()
            if isinstance(v, (int, float)) and "bytes" in k}


def annotate(name: str):
    """Named trace region (shows up in the profiler timeline)."""
    return jax.profiler.TraceAnnotation(name)
