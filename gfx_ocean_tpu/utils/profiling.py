"""Profiling and timing.

The reference's only instrumentation is an EMA of CPU frame time in the
window title (``src/lib.rs:146-148``), vsync-capped. Here:

- ``trace()``: context manager around ``jax.profiler`` — XLA/TPU traces
  viewable in TensorBoard / Perfetto, the real per-kernel cost breakdown.
- ``time_rollout()``: honest device-side throughput (BASELINE.md rules):
  jit warmup excluded, completion forced by a host transfer of the
  per-step checksums. On relayed backends (axon) ``block_until_ready``
  alone can under-report — only a transfer is trustworthy.
- ``ema()``: the reference's title-bar smoothing, for parity in the CLI
  (avg = avg*0.9 + dt*0.1).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, List

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_rollout(rollout: Callable, state, ts, repeats: int = 3) -> dict:
    """Median steps/sec of a checksum-mode rollout (see make_rollout)."""
    np.asarray(rollout(state, ts))  # warmup: compile + force completion
    times: List[float] = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        np.asarray(rollout(state, ts))
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    steps = int(np.shape(ts)[0])
    return {
        "steps": steps,
        "repeats_sec": [round(t, 5) for t in times],
        "median_sec": dt,
        "steps_per_sec": steps / dt,
        "ms_per_step": dt / steps * 1e3,
    }


class Ema:
    """Title-bar EMA of the reference (``src/lib.rs:146-148``)."""

    def __init__(self, alpha: float = 0.1):
        self.alpha = alpha
        self.value = 0.0

    def update(self, dt: float) -> float:
        self.value = self.value * (1.0 - self.alpha) + dt * self.alpha
        return self.value
