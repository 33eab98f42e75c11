#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tooling only — the
Scala library has no Python dependency).

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>

Runs each oracle_sql.json entry in DuckDB against the parquet tables in
<sfDir>, loads the Spark result parquet from <verifyOutDir>/<name>, and
compares: row count, column names (sorted), and exact values with columns
sorted by name (both row-order-as-is and row-sorted variants reported).

Each oracle is TIMED and held to a per-oracle budget (default 5 s at
sf0.01, override with GRAFT_ORACLE_BUDGET_SEC): the round-11 driver gate
produced an empty artifact because one recursive-closure oracle alone
took 176 s — a slow oracle must fail THIS tool loudly before the driver's
budgeted gate ever sees it. The ledger prints seconds per oracle and a
slowest-five summary.
"""
import json
import os
import sys
import time

import duckdb
import pandas as pd

BUDGET_SEC = float(os.environ.get("GRAFT_ORACLE_BUDGET_SEC", "5"))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def row_sorted(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    failures = 0
    skipped = 0
    timings = {}
    results = {}
    # A GRAFT_VERIFY_ONLY-filtered dump legitimately omits the other queries'
    # parquet dirs — but ONLY those. Any other missing dir means the query
    # crashed during Verify (it catches per-query Throwables and writes no
    # dir), and that must be a FAILURE, not a silent skip.
    only = {n for n in os.environ.get("GRAFT_VERIFY_ONLY", "").split(",") if n}
    for name, sql in sorted(oracles.items()):
        if not os.path.isdir(f"{out_dir}/{name}"):
            if only and name not in only:
                print(f"SKIP {name} (outside GRAFT_VERIFY_ONLY)")
                skipped += 1
            else:
                print(f"FAIL {name}: no parquet dir (query crashed during Verify, "
                      f"or dump was filtered without GRAFT_VERIFY_ONLY set)")
                results[name] = "FAIL: no parquet dir"
                failures += 1
            continue
        try:
            t0 = time.time()
            expected = norm(con.sql(sql).df())
            timings[name] = time.time() - t0
            got = norm(con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df())
        except Exception as e:
            print(f"FAIL {name}: load/exec error: {e}")
            results[name] = f"FAIL: load/exec error: {e}"[:200]
            failures += 1
            continue
        problems = []
        if timings[name] > BUDGET_SEC:
            problems.append(
                f"oracle took {timings[name]:.1f}s > {BUDGET_SEC:.0f}s budget "
                f"(reformulate it — a slow oracle can blank the driver's whole artifact)")
        # The driver's hash is DTYPE-sensitive where pandas equality is not:
        # an uncast DuckDB HUGEINT (e.g. bare integer sum()) arrives as
        # float64 while the Spark parquet column is int64 — identical values,
        # different hash (the exact r10 q77/q81/q85/q87/q105 failure). Flag
        # any int-vs-float dtype split as a failure even when values match.
        for c in set(expected.columns) & set(got.columns):
            ek, gk = expected[c].dtype.kind, got[c].dtype.kind
            if {ek, gk} == {"i", "f"}:
                problems.append(
                    f"dtype split on '{c}': oracle={expected[c].dtype} vs "
                    f"spark={got[c].dtype} (cast the oracle expression ::BIGINT)")
        if list(expected.columns) != list(got.columns):
            problems.append(f"columns: oracle={list(expected.columns)} got={list(got.columns)}")
        elif len(expected) != len(got):
            problems.append(f"rows: oracle={len(expected)} got={len(got)}")
        else:
            try:
                pd.testing.assert_frame_equal(expected, got, check_dtype=False, check_exact=True)
                ordered = "ordered-exact"
            except AssertionError:
                try:
                    pd.testing.assert_frame_equal(
                        row_sorted(expected), row_sorted(got), check_dtype=False, check_exact=True)
                    ordered = "row-sorted-exact (ORDER MISMATCH — fix the ORDER BY)"
                except AssertionError as e:
                    problems.append(f"values: {str(e).splitlines()[-1] if str(e) else e}")
                    ordered = None
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            results[name] = ("FAIL: " + "; ".join(problems))[:200]
            failures += 1
        else:
            print(f"PASS {name} ({len(got)} rows, {ordered}, oracle {timings[name]:.2f}s)")
            results[name] = f"PASS ({len(got)} rows, {ordered})" 
    checked = len(oracles) - skipped
    note = f", {skipped} skipped (GRAFT_VERIFY_ONLY filter)" if skipped else ""
    # Self-attested evidence artifact (committed per round so an empty
    # driver-side artifact is immediately diagnosable as harness-side):
    # per-query pass plus the per-oracle seconds ledger.
    out_json = os.environ.get("GRAFT_CORRECTNESS_OUT")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({
                "checked": checked, "passed": checked - failures,
                "failures": failures, "skipped": skipped,
                "results": results,
                "oracle_seconds": {k: round(v, 3) for k, v in sorted(timings.items())},
                "oracle_seconds_total": round(sum(timings.values()), 1),
                "budget_sec": BUDGET_SEC,
            }, f, indent=1)
    if timings:
        top = sorted(timings.items(), key=lambda kv: -kv[1])[:5]
        print("\nslowest oracles: " +
              ", ".join(f"{n} {s:.2f}s" for n, s in top) +
              f"; total {sum(timings.values()):.1f}s")
    print(f"\n{checked - failures}/{checked} passed{note}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
