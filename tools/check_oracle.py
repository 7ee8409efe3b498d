#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check_oracle.py [sf_dir] [out_dir]

Assumes `sbt "runMain graft.Verify <sf_dir> <out_dir>"` already ran (or runs
it with --run). For each query result parquet, runs the oracle SQL in DuckDB
over the same testdata tables, sorts columns by name, sorts rows, and
compares values.
"""
import json, math, os, subprocess, sys

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def values_equal(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None or (isinstance(a, float) and math.isnan(a)):
            return (a is None or math.isnan(a)) and (b is None or (isinstance(b, float) and math.isnan(b)))
        return math.isclose(float(a), float(b), rel_tol=1e-12, abs_tol=1e-12)
    return a == b


def main():
    if "--run" in sys.argv:
        subprocess.run(["sbt", f'runMain graft.Verify {SF} {OUT}'], check=True, cwd="/root/repo")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracles = json.load(open(f"{OUT}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        res_path = f"{OUT}/{name}"
        if not os.path.isdir(res_path):
            print(f"FAIL {name}: no result parquet"); n_bad += 1; continue
        try:
            got = norm(pd.read_parquet(res_path))
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}"); n_bad += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_bad += 1; continue
        bad = None
        for col in got.columns:
            for i, (x, y) in enumerate(zip(got[col], want[col])):
                if not values_equal(x, y):
                    bad = (col, i, x, y); break
            if bad: break
        if bad:
            print(f"FAIL {name}: col={bad[0]} row={bad[1]} spark={bad[2]!r} duck={bad[3]!r}")
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
