"""Metrics: on-device accumulation, periodic host flush, pluggable sinks.

The reference synchronizes the device SEVEN times per batch via ``.item()`` in its
print statement (README.md:837-839) — the single biggest throughput killer in its
loop (SURVEY.md §3.2). Here metric dicts stay on-device (jax.Array scalars); the
loop hands them to ``MetricsLogger`` which only forces a host transfer every
``flush_every`` steps, and does so with a single ``jax.device_get`` of the whole
dict rather than per-scalar syncs.

Sink key set preserves the reference's Neptune channel names:
"D loss", "G loss", "Recon loss", "KL", "D Real loss", "D Fake loss",
"adversarial loss" (README.md:842-849).
"""

from __future__ import annotations

import json
import sys
import time
from typing import Any, Dict, List, Mapping, Optional, TextIO

import jax

# our metric key -> reference Neptune channel name (README.md:842-849)
REFERENCE_KEYS = {
    "d_loss": "D loss",
    "g_loss": "G loss",
    "recon_loss": "Recon loss",
    "kl": "KL",
    "d_real_loss": "D Real loss",
    "d_fake_loss": "D Fake loss",
    "adv_loss": "adversarial loss",
}


class StdoutSink:
    """Reference-formatted per-batch line (README.md:837-839)."""

    def __init__(self, stream: Optional[TextIO] = None):
        self.stream = stream or sys.stdout

    def write(self, epoch: int, n_epochs: int, batch: int, n_batches: int,
              metrics: Mapping[str, float]) -> None:
        m = {k: round(float(v), 3) for k, v in metrics.items()}
        self.stream.write(
            f"[Epoch {epoch}/{n_epochs}] [Batch {batch}/{n_batches}] "
            f"[D loss: {m.get('d_loss')}] [G loss: {m.get('g_loss')}] "
            f"[Recon loss: {m.get('recon_loss')}] [KL: {m.get('kl')}], "
            f"[Real loss: {m.get('d_real_loss')}], [Fake loss: {m.get('d_fake_loss')}] "
            f"[adversarial loss: {m.get('adv_loss')}]]\n")
        self.stream.flush()


class JsonlSink:
    """One JSON object per flushed step; machine-readable training curve."""

    def __init__(self, path: str):
        self.path = path
        self._f: Optional[TextIO] = None

    def write(self, epoch, n_epochs, batch, n_batches, metrics) -> None:
        if self._f is None:
            self._f = open(self.path, "a")
        rec = {"ts": time.time(), "epoch": epoch, "batch": batch}
        rec.update({REFERENCE_KEYS.get(k, k): float(v) for k, v in metrics.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def close(self):
        if self._f:
            self._f.close()
            self._f = None


class NeptuneSink:
    """Streams the reference's exact Neptune channels (README.md:842-849) to a
    ``neptune.init_run``-style object: ``run[key].append(value)``. The run object is
    injected (the reference loads credentials from private/neptune.json,
    README.md:771-773); works with any object implementing the mapping protocol."""

    def __init__(self, run):
        self.run = run

    def write(self, epoch, n_epochs, batch, n_batches, metrics) -> None:
        for key, channel in REFERENCE_KEYS.items():
            if key in metrics:
                self.run[channel].append(float(metrics[key]))

    def close(self):
        stop = getattr(self.run, "stop", None)
        if callable(stop):
            stop()  # README.md:856-857


class MetricsLogger:
    """Buffers on-device metric dicts; flushes to sinks every ``flush_every`` steps.

    ``log`` is non-blocking (stores the jax.Array handles); only ``flush`` calls
    ``jax.device_get``. Per-step wall-clock is tracked host-side for throughput
    reporting (SURVEY.md §5: the metrics dict carries its own timing, needed to
    prove the img/s target).
    """

    def __init__(self, sinks: Optional[List[Any]] = None, flush_every: int = 1):
        self.sinks = sinks if sinks is not None else [StdoutSink()]
        self.flush_every = max(1, flush_every)
        self._buf: List[tuple] = []
        self._count = 0
        self.last_flush_time = time.time()
        self.history: List[Dict[str, float]] = []

    def log(self, epoch: int, n_epochs: int, batch: int, n_batches: int,
            metrics: Mapping[str, jax.Array]) -> None:
        self._buf.append((epoch, n_epochs, batch, n_batches, metrics))
        self._count += 1
        if self._count % self.flush_every == 0:
            self.flush()

    def flush(self) -> None:
        if not self._buf:
            return
        # one host sync for the whole buffer
        host = jax.device_get([m for *_, m in self._buf])
        for (epoch, n_epochs, batch, n_batches, _), metrics in zip(self._buf, host):
            metrics = {k: float(v) for k, v in metrics.items()}
            self.history.append(metrics)
            for sink in self.sinks:
                sink.write(epoch, n_epochs, batch, n_batches, metrics)
        self._buf.clear()
        self.last_flush_time = time.time()

    def close(self):
        self.flush()
        for s in self.sinks:
            if hasattr(s, "close"):
                s.close()
