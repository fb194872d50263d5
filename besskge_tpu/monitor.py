"""Profiling and throughput observability.

The reference has no in-library tracing (notebooks time epochs with
``time.time()``, SURVEY §5); here profiling is first-class:

* :class:`StepTimer` — wall-clock step timing with warm-up skipping and
  triples/s accounting (remote-backend safe: synchronizes on a fetched
  value, not ``block_until_ready``);
* :func:`trace` — context manager around ``jax.profiler`` writing a
  TensorBoard-loadable trace (XLA ops, fusion, collective overlap);
* :func:`device_memory_stats` — per-device HBM usage snapshot.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Dict, Iterator, List, Optional

import jax
import numpy as np

__all__ = ["StepTimer", "trace", "device_memory_stats"]


class StepTimer:
    """Accumulates per-step wall times and derives throughput.

    :param triples_per_step: positives scored per step (all shards).
    :param warmup: steps to exclude (compilation, cache warming).
    """

    def __init__(self, triples_per_step: int, warmup: int = 2) -> None:
        self.triples_per_step = triples_per_step
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        """Mark the start of a step."""
        self._t0 = time.perf_counter()

    def stop(self, sync_value: Any = None) -> float:
        """Mark the end of a step; pass a device scalar to synchronize on
        (fetching it forces execution to complete — reliable even on
        remote-attached backends where ``block_until_ready`` may not block).
        """
        if sync_value is not None:
            float(np.asarray(sync_value).ravel()[0])
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        self.times.append(dt)
        return dt

    @property
    def steady_times(self) -> List[float]:
        return self.times[self.warmup:]

    def summary(self) -> Dict[str, float]:
        """Mean/median step time and triples/s over the steady-state steps."""
        ts = self.steady_times or self.times
        if not ts:
            return {}
        mean = float(np.mean(ts))
        return {
            "steps": float(len(ts)),
            "mean_step_s": mean,
            "median_step_s": float(np.median(ts)),
            "p95_step_s": float(np.percentile(ts, 95)),
            "triples_per_s": self.triples_per_step / mean,
        }


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a ``jax.profiler`` trace (open with TensorBoard / xprof to
    inspect fusion, HBM traffic, and AllToAll/compute overlap)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats (bytes), where the backend reports them."""
    out: Dict[str, Dict[str, int]] = {}
    for dev in jax.devices():
        stats = getattr(dev, "memory_stats", lambda: None)()
        if stats:
            out[str(dev)] = {
                k: int(v)
                for k, v in stats.items()
                if isinstance(v, (int, np.integer))
            }
    return out
