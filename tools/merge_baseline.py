#!/usr/bin/env python3
"""Merge N graft.Bench JSON lines into the checked-in per-query baseline.

Policy per query class (the BASELINE.md methodology):
- batch queries: BEST (min) of the runs' `queries` (warm min) and
  `cold_queries` (pass-1) values — robust to box noise, and a fair bar
  for deterministic plans.
- `stream_*` queries: MEDIAN across runs on both columns. Their wall
  time is dominated by micro-batch trigger latency, not data work, so
  the min of many runs records one lucky scheduling draw that later
  single runs then "regress" against by 2-3x (round-6 verdict:
  stream_pipeline flagged at 2.96x of a min-of-6 baseline while every
  driver-side observation sat at the median). The median is the
  number a fresh run actually reproduces.

Usage: python3 tools/merge_baseline.py out.txt bench1.json [bench2.json ...]
Prints the BASELINE.md table body to stdout.
"""
import json
import statistics
import sys


def load(path: str) -> dict:
    s = open(path).read().strip()
    return json.loads(s[s.index("{"):])


def pick(q: str, vals: list[float]) -> float:
    return statistics.median(vals) if q.startswith("stream_") else min(vals)


def main(out: str, runs: list[str]) -> None:
    benches = [load(r) for r in runs]
    names = sorted(set().union(*[b["queries"].keys() for b in benches]))
    rows = []
    for q in names:
        mins = [b["queries"][q] for b in benches if q in b["queries"]]
        colds = [b.get("cold_queries", {}).get(q) for b in benches]
        colds = [c for c in colds if c is not None]
        if not colds:
            print(f"warning: {q} has no cold sample in any input run; "
                  "recording warm value as cold", file=sys.stderr)
        rows.append((q, pick(q, mins), pick(q, colds) if colds else pick(q, mins)))
    with open(out, "w") as f:
        f.write(
            f"# sf0.1 local[32] baseline, two-pass method, over {len(benches)} "
            f"runs (all {len(rows)} queries): min per batch query, median per "
            "stream_* query: <query> <min_sec> <cold_sec>\n")
        for q, m, c in rows:
            f.write(f"{q} {m:.3f} {c:.3f}\n")
    tot_m = sum(r[1] for r in rows)
    tot_c = sum(r[2] for r in rows)
    print(f"total min {tot_m:.2f} s / cold {tot_c:.2f} s over {len(rows)} queries")
    for q, m, c in rows:
        print(f"| {q} | {m:.3f} | {c:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
