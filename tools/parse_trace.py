#!/usr/bin/env python
"""Summarise a jax.profiler trace (trace.json.gz) by op category.

Usage: python tools/parse_trace.py /tmp/sr3d_trace [--steps N] [--top K]

Finds the newest ``*.trace.json.gz`` under the given directory, aggregates
device-side complete events by op-name prefix, and prints per-step costs.
This is how the round-1 perf work found that GN statistics + layout
copies + reshapes were 55% of sampling step time.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir: str):
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        return json.load(f).get("traceEvents", []), paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by N (e.g. scan length)")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    events, path = load_events(args.trace_dir)
    names = {e["pid"]: e["args"].get("name") for e in events
             if e.get("ph") == "M" and e.get("name") == "process_name"}

    cat = collections.Counter()
    cnt = collections.Counter()
    by_op = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if "TPU" not in str(names.get(e.get("pid"), "")):
            continue
        n = e["name"]
        if n.startswith(("jit_", "while")):
            continue
        prefix = re.split(r"[.\d]", n)[0]
        cat[prefix] += e["dur"]
        cnt[prefix] += 1
        by_op[n] += e["dur"]

    total = sum(cat.values())
    print(f"{path}\ndevice time: {total/1000:.1f} ms "
          f"({total/args.steps/1000:.2f} ms/step)\n")
    print("by category:")
    for k, us in cat.most_common(args.top):
        print(f"  {us/args.steps/1000:8.3f} ms/step ({100*us/total:4.1f}%) "
              f"x{cnt[k]//args.steps:<5} {k}")
    print("\ntop individual ops:")
    for k, us in by_op.most_common(args.top):
        print(f"  {us/args.steps/1000:8.3f} ms/step  {k[:80]}")


if __name__ == "__main__":
    main()
