#!/usr/bin/env python
"""Print the top-N individual XLA ops from a jax.profiler trace capture.

`profiling.summarize_trace` aggregates by category/source; this prints the
per-op detail (fusion names, shapes in the op name, durations) needed to
attribute a bucket to specific ops — e.g. which convolution or loop_fusion
dominates.  Also supports diffing two traces by op name (VERDICT r4 item 4:
name the b32-vs-b16 loop fusions).

Usage:
  python scripts/trace_ops.py LOGDIR [--top 40] [--steps 3] [--cat conv]
  python scripts/trace_ops.py LOGDIR --diff LOGDIR2 [--steps 3 --steps2 3]
"""
import argparse
import collections
import glob
import gzip
import json
import os


def load_ops(logdir, steps):
    paths = sorted(glob.glob(os.path.join(
        logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops = collections.defaultdict(lambda: [0.0, "", "", 0])
    for e in ev:
        if e.get("ph") != "X":
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops":
            continue
        a = e.get("args", {})
        rec = ops[e["name"]]
        rec[0] += e["dur"] / 1e3 / max(steps, 1)
        rec[1] = a.get("hlo_category", "?")
        rec[2] = a.get("source", "?")
        rec[3] += 1
    return ops


def main():
    p = argparse.ArgumentParser()
    p.add_argument("logdir")
    p.add_argument("--top", type=int, default=40)
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--steps2", type=int, default=3)
    p.add_argument("--cat", default="", help="filter: category substring")
    p.add_argument("--diff", default="", help="second logdir to diff against")
    args = p.parse_args()

    ops = load_ops(args.logdir, args.steps)
    if args.diff:
        ops2 = load_ops(args.diff, args.steps2)
        keys = set(ops) | set(ops2)
        rows = []
        for k in keys:
            a = ops.get(k, [0.0, "", "", 0])
            b = ops2.get(k, [0.0, "", "", 0])
            rows.append((b[0] - a[0], a[0], b[0], a[1] or b[1], k))
        rows.sort(reverse=True)
        print(f"{'delta':>8} {'A ms':>8} {'B ms':>8}  cat / op")
        for d, a, b, cat, k in rows[:args.top]:
            print(f"{d:8.3f} {a:8.3f} {b:8.3f}  [{cat}] {k}")
        ta = sum(v[0] for v in ops.values())
        tb = sum(v[0] for v in ops2.values())
        print(f"\ntotal: A {ta:.2f} ms  B {tb:.2f} ms  delta {tb - ta:.2f}")
        return

    rows = sorted(((v[0], v[1], v[2], v[3], k) for k, v in ops.items()),
                  reverse=True)
    total = sum(r[0] for r in rows)
    print(f"total device-op: {total:.2f} ms/step, {len(rows)} distinct ops")
    shown = 0
    for ms, cat, src, n, k in rows:
        if args.cat and args.cat not in cat:
            continue
        print(f"{ms:8.3f} ms x{n:<3} [{cat}] {k}   <{src}>")
        shown += 1
        if shown >= args.top:
            break


if __name__ == "__main__":
    main()
