#!/usr/bin/env python3
"""DEV-ONLY: stress-test individual oracle SQL statements under a tight
DuckDB memory_limit to prove they stay lean when the driver's host is
contended (the round-9 q91/q96/q97/q98 OOMs were oracle-side allocator
failures under ambient memory pressure, not engine bugs).

Run: python3 tools/oracle_stress.py /root/testdata/sf0.01 /tmp/vout \
        q91_span_dedup,q96_pagerank,q97_kmeans,q98_knn_join 200MB
"""
import json
import os
import sys
import time

import duckdb

SF_DIR = sys.argv[1]
OUT = sys.argv[2]
NAMES = sys.argv[3].split(",")
MEM = sys.argv[4] if len(sys.argv) > 4 else "200MB"
THREADS = int(sys.argv[5]) if len(sys.argv) > 5 else 0

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

for name in NAMES:
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{MEM}'")
    # no temp_directory: forbid spilling, so the limit is a hard working-
    # set bound — leaner than the driver's actual config (which spills)
    if THREADS:
        con.execute(f"SET threads={THREADS}")
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    t0 = time.time()
    try:
        n = len(con.execute(oracle[name]).fetchall())
        print(f"OK   {name}: {n} rows in {time.time()-t0:.2f}s "
              f"(mem={MEM}, threads={THREADS or 'default'})")
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__}: {e} "
              f"({time.time()-t0:.2f}s, mem={MEM})")
    con.close()
