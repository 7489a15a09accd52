#!/usr/bin/env python
"""Summarize a jax.profiler Perfetto trace: top ops by device self-time.

    python tools/trace_summary.py /tmp/trace_dir [--top 30] [--track XLA]

Finds the newest plugins/profile/*/<host>.trace.json.gz under the given
directory (the layout jax.profiler.start_trace writes), aggregates complete
('ph' == 'X') events by name per track, and prints the hottest ops. Used by
the profile-directed training pass (docs/DESIGN.md); no reference analogue
(the reference has no profiling — SURVEY.md §5).
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys


def find_trace(root: str):
    pats = [os.path.join(root, "**", "*.trace.json.gz"),
            os.path.join(root, "**", "*.trace.json")]
    hits = []
    for p in pats:
        hits += glob.glob(p, recursive=True)
    if not hits:
        raise SystemExit(f"no trace.json[.gz] under {root}")
    return max(hits, key=os.path.getmtime)


def load_events(path: str):
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", data if isinstance(data, list) else [])


def summarize(events, track_filter=None):
    """Aggregate SELF time per op name per track.

    Complete events on one thread nest (a lax.scan 'while' spans its body
    ops); naive duration sums double-count parents. Events are swept in
    (ts, -dur) order with an active-interval stack per (pid, tid), and each
    child's duration is subtracted from its enclosing parent — the printed
    numbers are exclusive (self) times that sum to the track total.
    """
    proc = {}
    thread = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                proc[e["pid"]] = e["args"].get("name", str(e["pid"]))
            elif e.get("name") == "thread_name":
                thread[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    by_thread = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = (f"{proc.get(e['pid'], e['pid'])}/"
                 f"{thread.get((e['pid'], e.get('tid')), e.get('tid'))}")
        if track_filter and track_filter.lower() not in track.lower():
            continue
        by_thread[track].append(e)

    per_track = collections.defaultdict(
        lambda: collections.defaultdict(float))
    track_total = collections.defaultdict(float)
    for track, evs in by_thread.items():
        evs.sort(key=lambda e: (e["ts"], -e["dur"]))
        stack = []  # (end_ts, name, self_dur accumulator index)
        selfs = []
        for e in evs:
            ts, dur, name = e["ts"], e["dur"], e.get("name", "?")
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                selfs[stack[-1][2]][1] -= dur
            selfs.append([name, dur])
            stack.append((ts + dur, name, len(selfs) - 1))
        for name, sd in selfs:
            per_track[track][name] += max(sd, 0.0)
            track_total[track] += max(sd, 0.0)
    return per_track, track_total


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--track", default=None,
                    help="substring filter on '<process>/<thread>' names")
    args = ap.parse_args()
    path = find_trace(args.trace_dir)
    print(f"# {path}")
    per_track, totals = summarize(load_events(path), args.track)
    for track in sorted(per_track, key=lambda t: -totals[t]):
        ops = per_track[track]
        total = totals[track]
        if total < 1000:  # skip sub-millisecond tracks
            continue
        print(f"\n== {track}  (total {total/1e3:.1f} ms) ==")
        for name, dur in sorted(ops.items(), key=lambda kv: -kv[1])[
                : args.top]:
            print(f"  {dur/1e3:9.2f} ms  {100*dur/total:5.1f}%  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
