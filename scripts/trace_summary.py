"""Summarize a jax.profiler trace: per-op device time, plus a grouped rollup.

Usage:  python scripts/trace_summary.py /tmp/eqv2_trace_r3e [--top 40]

Reads the newest ``plugins/profile/*/``**``.trace.json.gz`` under the given
directory (the TensorBoard-format trace ``jax.profiler.trace`` writes),
keeps events on device tracks (TPU/TensorCore pids), and prints total
duration by op name so kernel A/Bs can be attributed without TensorBoard.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def newest_trace(root: str) -> str:
    cands = sorted(
        glob.glob(os.path.join(root, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime,
    )
    if not cands:
        raise SystemExit(f"no *.trace.json.gz under {root}")
    return cands[-1]


def device_pids(events) -> set:
    """pids whose process_name metadata looks like a device track."""
    pids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e.get("args", {}).get("name", "")
            if re.search(r"TPU|TensorCore|/device:|Device", name, re.I) and not re.search(
                r"host|python|CUPTI", name, re.I
            ):
                pids.add(e["pid"])
    return pids


GROUPS = [
    ("fusion", r"^(loop_)?fusion"),
    ("custom-call(pallas)", r"custom-call|tpu_custom_call"),
    ("convolution/dot", r"convolution|dot"),
    ("copy/transpose", r"copy|transpose|bitcast"),
    ("sort", r"sort"),
    ("dynamic-slice/update", r"dynamic.(update.)?slice"),
    ("reduce", r"reduce"),
    ("all-gather/collective", r"all-gather|all-reduce|collective|permute"),
]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("root", nargs="?", default="./profile", help="trace directory")
    ap.add_argument("--top", type=int, default=40, help="rows in the per-op table")
    args = ap.parse_args()
    root, top = args.root, args.top
    path = newest_trace(root)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    pids = device_pids(events)
    by_name = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or (pids and e.get("pid") not in pids):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        by_name[name] += dur
        calls[name] += 1
        total += dur
    print(f"trace: {path}")
    print(f"device total: {total:.2f} ms over {sum(calls.values())} events")
    print(f"\n{'ms':>9}  {'%':>5}  {'calls':>6}  op")
    for name, dur in by_name.most_common(top):
        print(f"{dur:9.3f}  {100*dur/max(total,1e-9):5.1f}  {calls[name]:6d}  {name[:110]}")
    grouped = collections.Counter()
    for name, dur in by_name.items():
        for gname, pat in GROUPS:
            if re.search(pat, name):
                grouped[gname] += dur
                break
        else:
            grouped["other"] += dur
    print("\nby group:")
    for gname, dur in grouped.most_common():
        print(f"{dur:9.3f}  {100*dur/max(total,1e-9):5.1f}  {gname}")


if __name__ == "__main__":
    main()
