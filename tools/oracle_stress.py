#!/usr/bin/env python3
"""DEV-ONLY: stress-test individual oracle SQL statements under a tight
DuckDB memory_limit to prove they stay lean when the driver's host is
contended (the round-9 q91/q96/q97/q98 OOMs were oracle-side allocator
failures under ambient memory pressure, not engine bugs).

Each statement runs in its OWN spawned subprocess (the baseline_time.py
isolation): DuckDB connections leak allocator memory maps into the host
process even after close(), so a multi-statement run in one process hits
the vm.max_map_count fragmentation class and reports position-dependent
FAILs for statements that pass in isolation (measured: the SAME q108
statement OK at list position 1, OOM at position 3).

Run: python3 tools/oracle_stress.py /root/testdata/sf0.01 /tmp/vout \
        q91_span_dedup,q96_pagerank,q97_kmeans,q98_knn_join 200MB
"""
import json
import multiprocessing as mp
import sys

SF_DIR = sys.argv[1]
OUT = sys.argv[2]
NAMES = sys.argv[3].split(",")
MEM = sys.argv[4] if len(sys.argv) > 4 else "200MB"
THREADS = int(sys.argv[5]) if len(sys.argv) > 5 else 0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _run_stmt(sf_dir, sql, mem, threads, q):
    # fresh spawned process: clean allocator map table per statement
    import os
    import time

    import duckdb
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{mem}'")
    # no temp_directory: forbid spilling, so the limit is a hard working-
    # set bound — leaner than the driver's actual config (which spills)
    if threads:
        con.execute(f"SET threads={threads}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    t0 = time.time()
    try:
        n = len(con.execute(sql).fetchall())
        q.put(("ok", n, time.time() - t0))
    except Exception as e:  # noqa: BLE001 — report, don't crash the loop
        q.put(("fail", f"{type(e).__name__}: {e}", time.time() - t0))


def main():
    ctx = mp.get_context("spawn")
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    for name in NAMES:
        q = ctx.Queue()
        p = ctx.Process(target=_run_stmt,
                        args=(SF_DIR, oracle[name], MEM, THREADS, q))
        p.start()
        status, payload, dt = q.get()
        p.join()
        if status == "ok":
            print(f"OK   {name}: {payload} rows in {dt:.2f}s "
                  f"(mem={MEM}, threads={THREADS or 'default'})")
        else:
            print(f"FAIL {name}: {payload} ({dt:.2f}s, mem={MEM})")


if __name__ == "__main__":
    main()
