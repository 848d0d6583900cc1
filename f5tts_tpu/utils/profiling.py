"""Tracing/profiling: per-request stage timers + jax.profiler integration.

The reference's observability is a timing middleware and debug logs (SURVEY §5
"Tracing"); here stage timings are first-class (engine stages: preprocess,
sample, vocode, stitch) and device-level traces come from ``jax.profiler``
(viewable in TensorBoard/XProf)."""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict, deque


class StageTimer:
    """Thread-safe rolling stage timings with percentile summaries."""

    def __init__(self, window: int = 512):
        self._samples: dict[str, deque] = defaultdict(lambda: deque(maxlen=window))
        self._counts: dict[str, int] = defaultdict(int)
        self._lock = threading.Lock()

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._samples[name].append(dt)
                self._counts[name] += 1

    def record(self, name: str, seconds: float):
        with self._lock:
            self._samples[name].append(seconds)
            self._counts[name] += 1

    def summary(self) -> dict:
        out = {}
        with self._lock:
            for name, q in self._samples.items():
                if not q:
                    continue
                s = sorted(q)
                out[name] = {
                    "count": self._counts[name],
                    "p50_ms": round(s[len(s) // 2] * 1e3, 2),
                    "p95_ms": round(s[min(int(len(s) * 0.95), len(s) - 1)] * 1e3, 2),
                    "max_ms": round(s[-1] * 1e3, 2),
                }
        return out


GLOBAL_TIMER = StageTimer()


_profiler_active = False


def start_device_trace(log_dir: str) -> bool:
    """Start a jax.profiler trace (returns False if unsupported on backend)."""
    global _profiler_active
    if _profiler_active:
        return False
    import jax

    try:
        jax.profiler.start_trace(log_dir)
        _profiler_active = True
        return True
    except Exception:
        return False


def stop_device_trace() -> bool:
    global _profiler_active
    if not _profiler_active:
        return False
    import jax

    try:
        jax.profiler.stop_trace()
        return True
    finally:
        _profiler_active = False
