#!/usr/bin/env python3
"""Dev tool: time each oracle_sql.json entry in DuckDB (no Spark compare).

Usage: python3 tools/time_oracles.py <sfDir> <oracleJsonDir> [budget_sec]

Runs each oracle in a subprocess with a hard timeout (default 30 s) so a
pathological oracle can't wedge the sweep; prints a per-oracle seconds
ledger sorted slowest-first.
"""
import json
import multiprocessing as mp
import sys
import time

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def run_one(sf_dir, sql, q):
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    t0 = time.time()
    try:
        n = len(con.sql(sql).fetchall())
        q.put((time.time() - t0, n, None))
    except Exception as e:
        q.put((time.time() - t0, -1, str(e)[:200]))


def main(sf_dir, out_dir, budget=30.0):
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    results = []
    for name, sql in sorted(oracles.items()):
        q = mp.Queue()
        p = mp.Process(target=run_one, args=(sf_dir, sql, q))
        t_start = time.time()
        p.start()
        p.join(budget)
        elapsed = time.time() - t_start
        if p.is_alive():
            p.terminate()
            p.join()
            results.append((budget, name, -1, f"TIMEOUT >{budget}s"))
            print(f"{name}: TIMEOUT >{budget}s", flush=True)
        else:
            # the child can die WITHOUT enqueueing (OOM kill, segfault) —
            # a blocking get() would wedge the exact sweep the timeout
            # exists to protect
            try:
                sec, n, err = q.get(timeout=5)
            except Exception:
                # record the MEASURED elapsed, not the budget — a child
                # that died in 0.1s must not top the slowest-first ledger
                sec, n, err = elapsed, -1, f"CHILD DIED (exitcode {p.exitcode})"
            results.append((sec, name, n, err))
            tag = f"ERROR {err}" if err else f"{n} rows"
            print(f"{name}: {sec:.2f}s ({tag})", flush=True)
    print("\n=== slowest first ===")
    for sec, name, n, err in sorted(results, reverse=True)[:25]:
        print(f"{sec:7.2f}s  {name}" + (f"  [{err}]" if err else ""))
    total = sum(r[0] for r in results)
    print(f"\ntotal oracle time: {total:.1f}s over {len(results)} oracles")


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], float(sys.argv[3]) if len(sys.argv) > 3 else 30.0)
