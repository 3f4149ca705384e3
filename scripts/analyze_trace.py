#!/usr/bin/env python
"""Depth-1 timeline attribution of a jax.profiler trace.

Ground truth for where device time goes (framework_op_stats self-times
overcount nested events): find the outermost scan `while` on the XLA Ops
track, interval-merge the ops inside it at depth 1, and aggregate.

Usage: python scripts/analyze_trace.py [trace_dir] [--iters N] [--top N]
       (default trace dir: /tmp/jaxtrace, iters: 4 — must match the scan
       length used by scripts/capture_trace.py)
"""
import argparse
import collections
import glob
import gzip
import json
import re


def load_ops(trace_dir):
    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    ev = json.load(gzip.open(paths[0]))["traceEvents"]
    names = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            names[(e["pid"], e["tid"])] = e["args"]["name"]
    track = next(k for k, v in names.items() if v == "XLA Ops")
    return [e for e in ev
            if e.get("ph") == "X" and (e["pid"], e["tid"]) == track]


def depth1(events):
    events = sorted(events, key=lambda e: (e["ts"], -e["dur"]))
    kept, end = [], -1
    for e in events:
        if e["ts"] >= end:
            kept.append(e)
            end = e["ts"] + e["dur"]
    return kept


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir", nargs="?", default="/tmp/jaxtrace")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--exact", action="store_true",
                    help="aggregate by exact op name (fusion.123), not base")
    args = ap.parse_args()

    ops = load_ops(args.trace_dir)
    base = lambda n: re.sub(r"\.\d+(\.remat\d*)?$", "", n)
    W = max((e for e in ops if base(e["name"]) == "while"),
            key=lambda e: e["dur"])
    inner = [e for e in ops if e is not W
             and W["ts"] <= e["ts"] and e["ts"] + e["dur"] <= W["ts"] + W["dur"]]
    kept = depth1(inner)
    n = args.iters
    tot = sum(e["dur"] for e in kept) / 1e3
    print(f"depth-1: {len(kept)} events, {tot:.1f} ms total"
          f" -> {tot / n:.1f} ms/iter")
    agg = collections.Counter()
    cnt = collections.Counter()
    sample = {}
    for e in kept:
        key = e["name"] if args.exact else base(e["name"])
        agg[key] += e["dur"]
        cnt[key] += 1
        sample.setdefault(key, e)
    for k, d in agg.most_common(args.top):
        ln = str(sample[k].get("args", {}).get("long_name", ""))[:110]
        print(f"{d / n / 1e3:8.3f} ms x{cnt[k] / n:<7.2f} {k[:42]} | {ln}")


if __name__ == "__main__":
    main()
