#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB against views over <sfDir>'s
parquet tables, and compares: column names (sorted), dtypes, row counts, and
values (rows sorted by all columns, NaN-safe). Exit 1 on any mismatch.
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)  # full precision
    return repr(v)


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = []
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
        except Exception as e:
            failures.append((name, f"load/exec error: {e}"))
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            failures.append((name, f"columns differ: spark={gcols} oracle={wcols}"))
            continue
        got, want = got[gcols], want[wcols]
        gt = [str(t) for t in got.dtypes]
        wt = [str(t) for t in want.dtypes]
        if gt != wt:
            failures.append((name, f"dtypes differ: spark={list(zip(gcols,gt))} oracle={list(zip(wcols,wt))}"))
            # keep going — still compare values
        if len(got) != len(want):
            failures.append((name, f"row count: spark={len(got)} oracle={len(want)}"))
            continue
        grows = sorted([tuple(norm(v) for v in r) for r in got.itertuples(index=False)])
        wrows = sorted([tuple(norm(v) for v in r) for r in want.itertuples(index=False)])
        if grows != wrows:
            bad = [(a, b) for a, b in zip(grows, wrows) if a != b][:3]
            failures.append((name, f"values differ; first diffs: {bad}"))
            continue
        print(f"  OK   {name} ({len(got)} rows)")
    for name, why in failures:
        print(f"  FAIL {name}: {why}")
    print(f"{len(oracle) - len({n for n, _ in failures})}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
