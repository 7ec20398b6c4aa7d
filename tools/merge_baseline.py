#!/usr/bin/env python3
"""Merge N graft.Bench JSON lines into the checked-in per-query baseline:
for each query take the BEST (min) of the runs' `queries` (warm min) and
`cold_queries` (pass-1) values — the BASELINE.md methodology.

Usage: python3 tools/merge_baseline.py out.txt bench1.json [bench2.json ...]
Prints the BASELINE.md table body to stdout.
"""
import json
import sys


def load(path: str) -> dict:
    s = open(path).read().strip()
    return json.loads(s[s.index("{"):])


def main(out: str, runs: list[str]) -> None:
    benches = [load(r) for r in runs]
    names = sorted(set().union(*[b["queries"].keys() for b in benches]))
    rows = []
    for q in names:
        mins = [b["queries"][q] for b in benches if q in b["queries"]]
        colds = [b.get("cold_queries", {}).get(q) for b in benches]
        colds = [c for c in colds if c is not None]
        rows.append((q, min(mins), min(colds) if colds else min(mins)))
    with open(out, "w") as f:
        f.write(
            f"# sf0.1 local[32] baseline, two-pass method, per-query best of "
            f"{len(benches)} round-6 runs (all {len(rows)} queries): "
            "<query> <min_sec> <cold_sec>\n")
        for q, m, c in rows:
            f.write(f"{q} {m:.3f} {c:.3f}\n")
    tot_m = sum(r[1] for r in rows)
    tot_c = sum(r[2] for r in rows)
    print(f"total min {tot_m:.2f} s / cold {tot_c:.2f} s over {len(rows)} queries")
    for q, m, c in rows:
        print(f"| {q} | {m:.3f} | {c:.3f} |")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
