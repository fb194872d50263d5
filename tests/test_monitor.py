"""monitor.parse_trace_events: category bucketing + overlap math on a
synthetic Chrome-trace event stream."""

import numpy as np

from besskge_tpu.monitor import parse_trace_events, top_ops


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name",
            "args": {"name": name}}


def _op(pid, name, ts, dur):
    return {"ph": "X", "pid": pid, "tid": 0, "name": name, "ts": ts,
            "dur": dur}


def test_parse_trace_events_buckets_and_overlap():
    events = [
        _meta(1, "/device:TPU:0 ops"),
        _meta(2, "host python"),
        # device ops over a 100us span: fusions 0-40 and 60-90,
        # an all-to-all 30-70 (overlaps compute for 30-40 and 60-70 = 20us),
        # a copy 90-95. host events must be ignored.
        _op(1, "fusion.1", 0, 40),
        _op(1, "all-to-all.3", 30, 40),
        _op(1, "fusion.2", 60, 30),
        _op(1, "copy.7", 90, 5),
        _op(2, "np.sum", 0, 1000),
        # module-level meta-span must be dropped (double-counts everything)
        _op(1, "jit_train_step", 0, 100),
    ]
    out = parse_trace_events(events)
    # busy: union of [0,70] and [60,90] and [90,95] = [0,95] -> 95/95
    assert out["device_busy_pct"] == 100.0
    # collective 40us of 95 busy
    assert abs(out["collective_pct_of_busy"] - 100 * 40 / 95) < 0.11
    # overlap: 20us of the 40us all-to-all coincides with fusions
    assert abs(out["collective_overlap_pct"] - 50.0) < 0.11
    assert abs(out["data_movement_pct_of_busy"] - 100 * 5 / 95) < 0.11


def test_parse_trace_events_no_collectives():
    events = [
        _meta(7, "TPU:0"),
        _op(7, "fusion.1", 0, 50),
        _op(7, "fusion.2", 70, 10),
    ]
    out = parse_trace_events(events)
    assert out["collective_pct_of_busy"] == 0.0
    assert out["collective_overlap_pct"] == 0.0
    # busy 60 of span 80
    assert abs(out["device_busy_pct"] - 75.0) < 0.11


def test_parse_trace_events_empty():
    assert parse_trace_events([_meta(1, "TPU")]) == {}
    assert parse_trace_events([]) == {}


def test_top_ops_aggregates_and_orders():
    events = [
        _meta(1, "/device:TPU:0 ops"),
        _meta(2, "host python"),
        _op(1, "fusion.1", 0, 40),
        _op(1, "fusion.1", 100, 20),  # same op name: aggregated
        _op(1, "sort.5", 50, 45),
        _op(1, "copy.7", 95, 5),
        _op(2, "np.sum", 0, 1000),  # host: ignored
        _op(1, "jit_train_step", 0, 120),  # meta-span: ignored
    ]
    rows = top_ops(events, n=2)
    assert [r["name"] for r in rows] == ["fusion.1", "sort.5"]
    assert rows[0] == {
        "name": "fusion.1", "total_us": 60.0, "count": 2, "mean_us": 30.0,
    }
    assert top_ops([]) == []
