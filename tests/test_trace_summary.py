"""tools/trace_summary.py: self-time aggregation on a synthetic trace."""
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import trace_summary  # noqa: E402


def _trace(events):
    meta = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
    ]
    return meta + events


def _x(name, ts, dur):
    return {"ph": "X", "pid": 1, "tid": 2, "name": name, "ts": ts,
            "dur": dur}


def test_nested_events_yield_exclusive_self_time():
    """A scan 'while' spanning its body ops must not double-count: the
    parent keeps only the time not covered by children."""
    events = _trace([
        _x("while.1", 0, 100),       # parent
        _x("fusion.a", 10, 30),      # child
        _x("fusion.b", 50, 40),      # child
        _x("fusion.a", 200, 25),     # separate top-level occurrence
    ])
    per_track, totals = trace_summary.summarize(events)
    track = "/device:TPU:0/XLA Ops"
    ops = per_track[track]
    assert ops["while.1"] == 100 - 30 - 40   # exclusive
    assert ops["fusion.a"] == 30 + 25
    assert ops["fusion.b"] == 40
    # self times sum to the union of busy time
    assert totals[track] == 100 + 25


def test_track_filter_and_find_trace(tmp_path):
    events = _trace([_x("op", 0, 10)])
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    path = trace_summary.find_trace(str(tmp_path))
    assert path.endswith("host.trace.json.gz")
    loaded = trace_summary.load_events(path)
    per_track, _ = trace_summary.summarize(loaded, track_filter="nomatch")
    assert not per_track
    per_track, _ = trace_summary.summarize(loaded, track_filter="xla")
    assert per_track["/device:TPU:0/XLA Ops"]["op"] == 10
