#!/usr/bin/env python3
"""DEV-ONLY: time DuckDB executing every oracle SQL statement on the
same parquet tables the engine benches against — the same-machine
baseline the per-round grading compares BENCH_rN to.

Protocol mirrors Bench.scala: one warm pass (populates the OS page
cache and DuckDB's catalog), then `reps` timed passes per statement,
min taken; one JSON line at the end.

Each statement runs in its OWN spawned subprocess. Root cause, traced
via /proc/self/maps: one full-thread-count execution of an
unrolled-cosine statement fragments DuckDB's allocator into ~60k
memory maps (vm.max_map_count ceiling: 65,530), after which ANY
allocation in that process can fail with a small-block "bad
allocation" — including a reduced-thread retry in the same process
(the map table is already exhausted) and every later statement.
Process isolation makes each statement's timing independent of its
predecessors' allocator state. A statement that still dies at the
default thread count is retried (again isolated) at 8 threads — where
the same statement creates ~270 maps — and recorded as degraded
rather than failed, so the baseline total stays comparable instead of
silently dropping statements.

Run: python3 tools/baseline_time.py /root/testdata/sf0.1 /tmp/vout [reps]
(`/tmp/vout` only needs oracle_sql.json from a prior graft.Verify run.)
"""
import json
import multiprocessing as mp
import os
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _time_stmt(sf_dir, sql, reps, threads, q):
    # runs in a fresh spawned process: its map table starts clean
    import time

    import duckdb
    con = duckdb.connect()
    if threads is not None:
        con.execute(f"SET threads={int(threads)}")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    con.execute(sql).fetchall()  # warm
    best = min(
        (lambda t0: (con.execute(sql).fetchall(), time.time() - t0)[1])(
            time.time())
        for _ in range(reps))
    q.put(best)


def run_isolated(ctx, sf_dir, sql, reps, threads, timeout_s=1800):
    q = ctx.Queue()
    p = ctx.Process(target=_time_stmt,
                    args=(sf_dir, sql, reps, threads, q))
    p.start()
    p.join(timeout_s)
    if p.is_alive():
        p.terminate()
        p.join()
        raise RuntimeError(f"timed out after {timeout_s}s")
    if p.exitcode != 0 or q.empty():
        raise RuntimeError(f"statement process exited {p.exitcode}")
    return q.get()


def main():
    sf_dir = sys.argv[1]
    out = sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    # spawn, NOT fork: a fork would copy the parent's map table, which
    # is exactly the state isolation exists to discard
    ctx = mp.get_context("spawn")

    times = {}
    failed = []
    degraded = []
    for name in sorted(oracle):
        sql = oracle[name]
        # default threads first — the baseline must be DuckDB at its
        # best; only a crashing statement pays the 8-thread fallback
        for attempt, threads in enumerate((None, 8)):
            try:
                best = run_isolated(ctx, sf_dir, sql, reps, threads)
                times[name] = round(best, 3)
                if threads is not None:
                    degraded.append(name)
                break
            except Exception as e:
                if attempt == 1:
                    failed.append(name)
                    print(f"FAIL {name}: {e}", file=sys.stderr)
                else:
                    print(f"RETRY {name} at threads=8: {e}",
                          file=sys.stderr)

    print(json.dumps({
        "metric": "duckdb_baseline_total",
        "value": round(sum(times.values()), 2),
        "unit": "sec", "queries": times, "reps": reps, "failed": failed,
        "degraded_to_8_threads": degraded, "sf": sf_dir}))


if __name__ == "__main__":
    main()
