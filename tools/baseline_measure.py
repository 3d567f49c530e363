#!/usr/bin/env python3
"""Measure DuckDB oracle baselines (min-of-N wall clock) for named queries.

Mirrors the BASELINE.md protocol: views over the sf parquet tables, each
query's oracle SQL executed to a fully-materialized DataFrame, min of N
timed runs after one warm run, single process, all cores.

Usage: python3 tools/baseline_measure.py <sfDir> <oracle_sql.json> <query ...>
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

REPS = 5


def main():
    sfdir, oracle_path = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    oracle = json.load(open(oracle_path))
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")
    out = {}
    for name in names:
        sql = oracle[name]
        con.execute(sql).df()  # warm (file cache, catalog)
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            con.execute(sql).df()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
