#!/usr/bin/env python3
"""Fold a BENCH_FULL.json run into dev/bench_baseline.json.

The baseline keeps the per-query MINIMUM over every recorded run —
the plan's cost bounded from below. graft.Bench diffs each run
against it and flags any query exceeding max(3x baseline,
baseline + 0.5 s) in its stdout line, so a planner/codegen blowup
(round 4's 468 s hilbert key) trips the harness, not the judge.

Usage: dev/record_baseline.py [BENCH_FULL.json]
"""
import json, os, sys

src = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
dst = os.path.join(os.path.dirname(__file__), "bench_baseline.json")
run = json.load(open(src))["queries"]
base = json.load(open(dst)) if os.path.exists(dst) else {}
for k, v in run.items():
    if v < 0:
        continue  # failed run — never a baseline
    base[k] = min(base.get(k, v), v)
json.dump(dict(sorted(base.items())), open(dst, "w"), indent=0)
print(f"{dst}: {len(base)} queries")
