#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]

Assumes graft.Verify has already written <outDir>/<query>/ parquet dirs and
<outDir>/oracle_sql.json (run via: sbt "runMain graft.Verify <sfDir> <outDir>").
Registers every testdata parquet as a DuckDB view, runs each oracle, and
compares against the Spark result: columns sorted by name, rows sorted by all
columns, values compared cell-by-cell (floats to 1e-9 rel tol).
"""
import sys, os, json, glob
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"

con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)

fails = 0
for name in sorted(oracle):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    s = canon(pd.concat([pd.read_parquet(f) for f in sorted(spark_files)]))
    try:
        d = canon(con.execute(oracle[name]).df())
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        fails += 1
        continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows spark={len(s)} duck={len(d)}")
        fails += 1
        continue
    bad = None
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            import numpy as np
            sx = pd.to_numeric(sv, errors="coerce").astype(float)
            dx = pd.to_numeric(dv, errors="coerce").astype(float)
            ok = np.isclose(sx, dx, rtol=1e-9, atol=1e-9, equal_nan=True)
            if not ok.all():
                bad = (c, sv[~ok].head(3).tolist(), dv[~ok].head(3).tolist())
                break
        else:
            eq = (sv.astype(str).fillna("<NA>") == dv.astype(str).fillna("<NA>"))
            if not eq.all():
                bad = (c, sv[~eq].head(3).tolist(), dv[~eq].head(3).tolist())
                break
    if bad:
        print(f"FAIL {name}: col {bad[0]} spark={bad[1]} duck={bad[2]}")
        fails += 1
    else:
        print(f"PASS {name} ({len(s)} rows)")

missing = [q for q in os.listdir(out_dir)
           if os.path.isdir(f"{out_dir}/{q}") and q not in oracle]
for q in missing:
    print(f"NOTE {q}: no oracle (rows-only check in driver)")
sys.exit(1 if fails else 0)
