#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs graft.Verify at a given SF dir, then executes every oracle SQL in
DuckDB over the same parquet tables and compares result sets
(column-name-sorted, row-sorted, exact values). Run before committing new
queries so the real gate never surprises us.

Usage: python3 tools/oracle_check.py [sfdir] [outdir]
"""
import json
import math
import subprocess
import sys
from pathlib import Path

import duckdb
import pyarrow.dataset as ds

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    r = subprocess.run(
        ["sbt", "-batch", f"runMain graft.Verify {SF} {OUT}"],
        capture_output=True, text=True, cwd="/root/repo", timeout=1800)
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        sys.exit("verify run failed")


def canon(val):
    if val is None:
        return None
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return val
    if isinstance(val, (list, tuple)):
        return tuple(canon(v) for v in val)
    if hasattr(val, "isoformat"):
        return val.isoformat()
    import decimal
    if isinstance(val, decimal.Decimal):
        return float(val)
    return val


def rows_of(table):
    cols = sorted(table.column_names)
    arr = table.select(cols).to_pylist()
    return cols, sorted(tuple(canon(r[c]) for c in cols) for r in arr)


def main():
    run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    failures = 0
    for name in sorted(p.name for p in OUT.iterdir() if p.is_dir()):
        spark_tbl = ds.dataset(str(OUT / name)).to_table()
        if name not in oracle:
            print(f"  [rows-only] {name}: {spark_tbl.num_rows} rows")
            continue
        duck_tbl = con.sql(oracle[name]).arrow()
        scols, srows = rows_of(spark_tbl)
        dcols, drows = rows_of(duck_tbl)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            failures += 1
            continue
        if srows == drows:
            print(f"  OK {name}: {len(srows)} rows")
            continue
        failures += 1
        print(f"FAIL {name}: {len(srows)} spark rows vs {len(drows)} duckdb rows")
        sset, dset = set(srows), set(drows)
        for r in list(sset - dset)[:3]:
            print(f"    spark-only: {r}")
        for r in list(dset - sset)[:3]:
            print(f"    duck-only:  {r}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
