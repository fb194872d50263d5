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


def trace_breakdown(run, log_dir: str) -> Dict[str, Any]:
    """Profile ``run()`` and return a device-time breakdown from the trace.

    Parses the Chrome-trace events ``jax.profiler`` writes (works through
    the remote TPU backend) and reports, over the traced span of the device
    op track: busy share, time in collectives (all-to-all / all-gather /
    all-reduce / collective-permute), time in data movement
    (copy/gather/scatter/slice), and the share of collective time that
    OVERLAPS other device computation — the BESS north-star metric
    (BASELINE.md: "AllToAll/compute overlap %"). Single-chip programs have
    no collectives; the fields then read 0.
    """
    import glob
    import gzip
    import json

    with trace(log_dir):
        run()

    paths = sorted(
        glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True)
    )
    if not paths:
        return {}
    events = json.load(gzip.open(paths[-1]))["traceEvents"]
    return parse_trace_events(events)


def parse_trace_events(events) -> Dict[str, Any]:
    """The pure parsing half of :func:`trace_breakdown` (unit-testable)."""
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    ops = [
        e
        for e in events
        if e.get("ph") == "X"
        and e.get("pid") in device_pids
        and e.get("dur", 0) > 0
        # keep leaf op events; drop module/step meta-spans that cover
        # everything and would double-count
        and not str(e.get("name", "")).startswith(("jit_", "pjit"))
    ]
    if not ops:
        return {}

    def intervals(pred):
        iv = sorted(
            (e["ts"], e["ts"] + e["dur"]) for e in ops if pred(e["name"])
        )
        merged: List[List[float]] = []
        for s, t in iv:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], t)
            else:
                merged.append([s, t])
        return merged

    def total(merged):
        return sum(t - s for s, t in merged)

    def overlap(a, b):
        out, i, j = 0.0, 0, 0
        while i < len(a) and j < len(b):
            s = max(a[i][0], b[j][0])
            t = min(a[i][1], b[j][1])
            if t > s:
                out += t - s
            if a[i][1] < b[j][1]:
                i += 1
            else:
                j += 1
        return out

    coll_keys = (
        "all-to-all", "all-gather", "all-reduce", "collective-permute",
        "reduce-scatter",
    )
    move_keys = ("copy", "gather", "scatter", "dynamic-slice",
                 "dynamic-update-slice")

    lo = min(e["ts"] for e in ops)
    hi = max(e["ts"] + e["dur"] for e in ops)
    span = hi - lo
    all_iv = intervals(lambda n: True)
    coll_iv = intervals(lambda n: any(k in n for k in coll_keys))
    comp_iv = intervals(lambda n: not any(k in n for k in coll_keys))
    move = total(intervals(lambda n: any(k in n for k in move_keys)))
    busy = total(all_iv)
    coll = total(coll_iv)
    return {
        "device_busy_pct": round(100 * busy / span, 1) if span else 0.0,
        "collective_pct_of_busy": round(100 * coll / busy, 1) if busy else 0.0,
        "collective_overlap_pct": (
            round(100 * overlap(coll_iv, comp_iv) / coll, 1) if coll else 0.0
        ),
        "data_movement_pct_of_busy": (
            round(100 * move / busy, 1) if busy else 0.0
        ),
    }


def top_ops(events, n: int = 25) -> List[Dict[str, Any]]:
    """Top device ops by summed duration, from Chrome-trace events.

    The per-op companion to :func:`parse_trace_events`: where that reports
    category shares (collectives / data movement), this names the exact
    fusions the step spends its time in — the tool for LATENCY-bound steps,
    where no category dominates but a few small kernels serialize.
    Returns ``[{"name", "total_us", "count", "mean_us"}, ...]``, largest
    first, over the same leaf-op filter as :func:`parse_trace_events`.
    """
    device_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    acc: Dict[str, List[float]] = {}
    for e in events:
        if (
            e.get("ph") == "X"
            and e.get("pid") in device_pids
            and e.get("dur", 0) > 0
            and not str(e.get("name", "")).startswith(("jit_", "pjit"))
        ):
            a = acc.setdefault(str(e["name"]), [0.0, 0])
            a[0] += e["dur"]
            a[1] += 1
    rows = [
        {
            "name": k,
            "total_us": round(v[0], 1),
            "count": v[1],
            "mean_us": round(v[0] / v[1], 2),
        }
        for k, v in acc.items()
    ]
    rows.sort(key=lambda r: -r["total_us"])
    return rows[:n]


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
