#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare. Usage:
    python3 tools/check_oracle.py <sfDir> <outDir> [jsonOut]
(after: sbt "runMain graft.Verify <sfDir> <outDir>")

With jsonOut, per-query results (rows/schema/hash-equivalent value
match) are also written as a JSON artifact — the round-resilience copy
committed as CORRECTNESS_local_r{N}.json so an empty driver artifact
never leaves a round unverifiable.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str, json_out: str | None = None) -> int:
    results = {}
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: spark output missing")
            results[name] = {"status": "fail", "reason": "spark output missing"}
            n_fail += 1
            continue
        try:
            spark_df = pd.read_parquet(qdir)
            duck_df = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {str(e)[:300]}")
            results[name] = {"status": "fail", "reason": f"{type(e).__name__}: {str(e)[:300]}"}
            n_fail += 1
            continue
        s, d = norm(spark_df), norm(duck_df)
        if list(s.columns) != list(d.columns):
            print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}")
            results[name] = {"status": "fail", "reason": "schema", "spark_cols": list(s.columns), "oracle_cols": list(d.columns)}
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"FAIL {name}: rows {len(s)} vs {len(d)}")
            results[name] = {"status": "fail", "reason": "rows", "spark_rows": len(s), "oracle_rows": len(d)}
            n_fail += 1
            continue
        # dtype check (driver checks schema): allow int32/int64 equivalence noted explicitly
        mism = [c for c in s.columns if str(s[c].dtype) != str(d[c].dtype)]
        if mism:
            print(f"WARN {name}: dtype diff {[(c, str(s[c].dtype), str(d[c].dtype)) for c in mism]}")
        try:
            pd.testing.assert_frame_equal(s, d, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(s)} rows)")
            results[name] = {"status": "pass", "rows": len(s), "schema_match": True,
                             "value_match": True, "dtype_warn": mism}
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: values differ: {str(e)[:400]}")
            results[name] = {"status": "fail", "reason": f"values differ: {str(e)[:400]}"}
            n_fail += 1
    rows_only = [p.name for p in Path(out_dir).iterdir() if p.is_dir() and p.name not in oracle]
    for name in rows_only:
        try:
            n = len(pd.read_parquet(Path(out_dir) / name))
        except Exception:
            n = -1
        results[name] = {"status": "rows_only", "rows": n}
    print(f"\n{n_pass} pass / {n_fail} fail; rows-only (no oracle): {rows_only}")
    if json_out:
        Path(json_out).write_text(json.dumps(
            {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail, "queries": results},
            indent=1, sort_keys=True))
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))
