#!/usr/bin/env python3
"""DEV-ONLY: time DuckDB executing every oracle SQL statement on the
same parquet tables the engine benches against — the same-machine
baseline the per-round grading compares BENCH_rN to.

Protocol mirrors Bench.scala: one warm pass (populates the OS page
cache and DuckDB's catalog), then `reps` timed passes per statement,
min taken; one JSON line at the end.

Run: python3 tools/baseline_time.py /root/testdata/sf0.1 /tmp/vout [reps]
(`/tmp/vout` only needs oracle_sql.json from a prior graft.Verify run.)
"""
import json
import os
import sys
import time

import duckdb

SF_DIR = sys.argv[1]
OUT = sys.argv[2]
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

oracle = json.load(open(f"{OUT}/oracle_sql.json"))


def connect():
    # ONE connection per statement: a single shared connection
    # accumulates allocator fragmentation across 100+ statements and
    # fails LEAN queries mid-run with tiny-block OOMs (observed: q87-q91
    # failing 16-256KB allocations in a shared-connection pass while
    # each passes alone under a 500MB limit via oracle_stress.py) --
    # which would misreport engine-vs-baseline coverage
    con = duckdb.connect()
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


times = {}
failed = []
for name in sorted(oracle):
    sql = oracle[name]
    try:
        con = connect()
        con.execute(sql).fetchall()  # warm
        best = min(
            (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(
                time.time())
            for _ in range(REPS))
        times[name] = round(best, 3)
        con.close()
    except Exception as e:
        failed.append(name)
        print(f"FAIL {name}: {e}", file=sys.stderr)

print(json.dumps({
    "metric": "duckdb_baseline_total", "value": round(sum(times.values()), 2),
    "unit": "sec", "queries": times, "reps": REPS, "failed": failed,
    "sf": SF_DIR}))
