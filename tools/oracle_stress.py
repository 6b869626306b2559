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

Single-process sequential mode (`--seq`) replays ALL statements in ONE
32-thread connection in sorted gate order — the DRIVER's execution
profile. The failure class it reproduces is cumulative: each
full-thread-count execution of a wide-expression statement fragments the
process allocator into more memory maps (ceiling vm.max_map_count =
65,530), and once the table is near-full ANY later statement can fail
with a tiny "bad allocation" (the r12 q90 driver loss). The per-stmt
`maps=` column names the fragmenters. No memory_limit here — the driver
sets none; the binding resource is the map table, not bytes.

Run: python3 tools/oracle_stress.py /root/testdata/sf0.01 /tmp/vout --seq
     (optional thread count directly after --seq; defaults to 32)
"""
import json
import multiprocessing as mp
import sys

SF_DIR = sys.argv[1]
OUT = sys.argv[2]
SEQ = len(sys.argv) > 3 and sys.argv[3] == "--seq"
NAMES = None if SEQ else sys.argv[3].split(",")
# The two modes take different tails: isolated mode is
#   <names> [MEM] [THREADS], seq mode is --seq [THREADS] (no memory
# limit — the driver sets none). Parsing them positionally from one
# layout forced a dummy MEM placeholder to reach THREADS in --seq.
if SEQ:
    MEM = None
    THREADS = int(sys.argv[4]) if len(sys.argv) > 4 else 0
else:
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


def _n_maps():
    with open("/proc/self/maps") as f:
        return sum(1 for _ in f)


def seq_main():
    """Driver-profile replay: one process, one connection, 32 threads,
    every oracle statement in sorted order. Exits 1 on any failure OR
    if the map table ever crosses 80% of vm.max_map_count (a pass that
    close to the ceiling is one ambient allocation away from the r12
    q90 loss, so treat it as red)."""
    import os
    import time

    import duckdb
    threads = THREADS or 32
    ceiling = int(open("/proc/sys/vm/max_map_count").read())
    oracle = json.load(open(f"{OUT}/oracle_sql.json"))
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    failed = []
    peak = 0
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            n = len(con.execute(sql).fetchall())
            status = f"OK   {name}: {n} rows"
        except Exception as e:  # noqa: BLE001
            failed.append(name)
            status = f"FAIL {name}: {type(e).__name__}: {e}"
        m = _n_maps()
        peak = max(peak, m)
        print(f"{status} ({time.time() - t0:.2f}s, maps={m})", flush=True)
    frac = peak / ceiling
    print(f"\nseq replay: {len(oracle) - len(failed)}/{len(oracle)} ok, "
          f"peak maps {peak}/{ceiling} ({frac:.0%}), threads={threads}")
    if failed:
        print(f"FAILED: {','.join(failed)}")
    sys.exit(1 if failed or frac > 0.8 else 0)


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
    seq_main() if SEQ else main()
