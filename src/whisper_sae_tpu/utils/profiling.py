"""Profiling and throughput instrumentation.

The reference has no runtime instrumentation beyond rich progress bars
(SURVEY §5.1).  Here: a ``jax.profiler`` trace context behind a flag and
a throughput meter reporting the driver-defined metric
(activations/sec/chip) per epoch.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(trace_dir: str | Path | None):
    """Capture a jax.profiler trace (TensorBoard format) when a directory
    is given; no-op otherwise.

        with trace("profiles/run1"):
            trainer.train(...)
    """
    if trace_dir is None:
        yield
        return
    trace_dir = Path(trace_dir)
    trace_dir.mkdir(parents=True, exist_ok=True)
    try:
        jax.profiler.start_trace(str(trace_dir))
    except Exception as e:  # experimental backends may lack trace support
        print(f"profiler trace unavailable ({e}); continuing without", flush=True)
        yield
        return
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class ThroughputMeter:
    """Tokens/sec (activations/sec/chip) meter over training epochs."""

    num_chips: int = 1
    _t0: float | None = None
    _tokens: int = 0
    history: list[dict] = field(default_factory=list)

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._tokens = 0

    def add_tokens(self, n: int) -> None:
        self._tokens += int(n)

    def stop(self) -> dict:
        assert self._t0 is not None, "call start() first"
        dt = time.perf_counter() - self._t0
        entry = {
            "tokens": self._tokens,
            "seconds": dt,
            "activations_per_sec": self._tokens / dt if dt > 0 else 0.0,
            "activations_per_sec_per_chip": (
                self._tokens / dt / max(self.num_chips, 1) if dt > 0 else 0.0
            ),
        }
        self.history.append(entry)
        self._t0 = None
        return entry
