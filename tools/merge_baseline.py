#!/usr/bin/env python3
"""Merge N graft.Bench JSON lines into the checked-in per-query baseline.

Policy per query class and column (the BASELINE.md methodology,
round-10 revision):
- warm (min) column:
  - batch queries: BEST (min) of the runs' `queries` values — robust
    to box noise, and a fair bar for deterministic plans.
  - `stream_*` queries: MEDIAN across runs. Their wall time is
    dominated by micro-batch trigger latency, not data work, so the
    min of many runs records one lucky scheduling draw that later
    single runs then "regress" against by 2-3x (round-6 verdict:
    stream_pipeline flagged at 2.96x of a min-of-6 baseline while
    every driver-side observation sat at the median). The median is
    the number a fresh run actually reproduces.
- cold column: MEDIAN across runs for EVERY query (round-10 change).
  Cold is one sample per run by nature; the old best-of-many-runs
  composite was a bar no single fresh pass could reproduce uniformly
  (round-9 driver run: 4.15x of the composite while the same-day
  builder runs sat at ~1.04x). The median of fresh same-box runs is
  what a fresh run actually lands on.
- `__calib_*` rows (the box-speed calibration workloads in
  graft.Bench): min column = MIN across runs of the per-run
  min-of-passes (matching how the warm comparison uses them), cold
  column = MEDIAN across runs of the pass-A value (matching cold's
  one-sample semantics).

Usage: python3 tools/merge_baseline.py out.txt bench1.json [bench2.json ...]
Prints the BASELINE.md table body to stdout.
"""
import json
import statistics
import sys


def load(path: str) -> dict:
    s = open(path).read().strip()
    return json.loads(s[s.index("{"):])


def pick_warm(q: str, vals: list[float]) -> float:
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
        rows.append((q, pick_warm(q, mins),
                     statistics.median(colds) if colds else pick_warm(q, mins)))
    calib_names = sorted(set().union(
        *[b.get("calibration", {}).keys() for b in benches]))
    calib_rows = []
    for c in calib_names:
        mins = [b["calibration"][c]["min"] for b in benches
                if c in b.get("calibration", {})]
        colds = [b["calibration"][c]["cold"] for b in benches
                 if c in b.get("calibration", {})]
        calib_rows.append((f"__calib_{c}", min(mins), statistics.median(colds)))
    with open(out, "w") as f:
        f.write(
            f"# sf0.1 local[32] baseline, two-pass method, over {len(benches)} "
            f"fresh-JVM runs (all {len(rows)} queries).\n"
            "# warm col: min per batch query, median per stream_* query;\n"
            "# cold col: median across runs (one pass-1 sample per run).\n"
            "# __calib_* rows: the graft.Bench box-speed workloads captured in\n"
            "# the SAME runs (min col = min of min-of-passes, cold col = median\n"
            "# of pass-A) - Bench divides every comparison by the observed/\n"
            "# baseline calibration ratio so the gate tracks the code, not the\n"
            "# box. Lines: <query> <min_sec> <cold_sec>\n")
        for q, m, c in calib_rows + rows:
            f.write(f"{q} {m:.3f} {c:.3f}\n")
    tot_m = sum(r[1] for r in rows)
    tot_c = sum(r[2] for r in rows)
    print(f"total min {tot_m:.2f} s / cold {tot_c:.2f} s over {len(rows)} queries")
    for q, m, c in calib_rows + rows:
        print(f"| {q} | {m:.3f} | {c:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
