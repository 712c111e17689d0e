"""Profiling / tracing — absent in the reference (SURVEY.md §5); first-class here.

- ``trace(dir)``: context manager around ``jax.profiler.trace`` producing an
  xplane/trace.json.gz dump viewable in XProf/Perfetto.
- ``annotate(name)``: named trace scope (``jax.profiler.TraceAnnotation``) for
  marking pipeline phases / kernels in the timeline.
- ``start_server(port)``: live profiler endpoint for on-demand capture.
- ``step_timer``: host-side steps/sec and images/sec tracking that syncs via a
  device_get of a metric value (``block_until_ready`` is unreliable over tunneled
  PJRT backends) — the timing evidence for the BASELINE img/s target.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    return jax.profiler.TraceAnnotation(name)


def start_server(port: int = 9999):
    return jax.profiler.start_server(port)


class StepTimer:
    """Steady-state throughput measurement with warmup exclusion."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._count = 0
        # warmup=0 (pre-warmed caller): the measured window starts NOW — tick()
        # fires only after each step, so it could never start a zero-warmup clock
        self._t0: Optional[float] = time.perf_counter() if warmup == 0 else None

    def tick(self, sync_value: Optional[jax.Array] = None) -> None:
        """Call once per step; pass a (small) device value to hard-sync on."""
        self._count += 1
        if self._count == self.warmup:
            if sync_value is not None:
                float(jax.device_get(sync_value))
            self._t0 = time.perf_counter()

    def result(self, images_per_step: int, sync_value: Optional[jax.Array] = None) -> Dict[str, float]:
        if sync_value is not None:
            float(jax.device_get(sync_value))
        steps = self._count - self.warmup
        if self._t0 is None or steps <= 0:
            return {"steps_per_sec": 0.0, "images_per_sec": 0.0,
                    "seconds_per_step": 0.0}
        dt = time.perf_counter() - self._t0
        return {
            "steps_per_sec": steps / dt,
            "images_per_sec": steps * images_per_step / dt,
            "seconds_per_step": dt / steps,
        }
