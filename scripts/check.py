#!/usr/bin/env python3
"""Local correctness self-check, mirroring the driver's gate: run
graft.Verify first (writes <out>/<query>.parquet + oracle_sql.json), then
this script runs each oracle SQL in DuckDB over the same sf dir and
compares rows/schema/values (columns sorted by name, rows sorted).

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if glob.glob(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

fails = 0
for name in sorted(oracle):
    if only and name not in only:
        continue
    spark_path = os.path.join(out_dir, name)
    if not glob.glob(os.path.join(spark_path, "*.parquet")):
        print(f"{name}: MISSING spark output")
        fails += 1
        continue
    s = con.sql(f"SELECT * FROM '{spark_path}/*.parquet'").df()
    try:
        o = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}")
        fails += 1
        continue
    s = s[sorted(s.columns)]
    o = o[sorted(o.columns)]
    ok_rows = len(s) == len(o)
    ok_schema = list(s.columns) == list(o.columns)
    ok_vals = False
    err = []
    if ok_rows and ok_schema:
        sv = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        ov = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        try:
            import pandas.testing as pdt
            pdt.assert_frame_equal(sv, ov, check_dtype=False, check_exact=False, rtol=0, atol=1e-9)
            ok_vals = True
        except Exception as e:  # AssertionError on mismatch, anything else on import/compare
            ok_vals = False
            err = str(e).splitlines()[0:4]
    status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
    if status == "FAIL":
        fails += 1
        print(f"{name}: {status} rows={len(s)}/{len(o)} schema={ok_schema} "
              f"cols_spark={list(s.columns)} cols_oracle={list(o.columns)}")
        if ok_rows and ok_schema:
            print("  " + "\n  ".join(err))
    else:
        print(f"{name}: OK ({len(s)} rows)")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
