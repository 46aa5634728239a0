#!/usr/bin/env python3
"""Paired DuckDB-oracle timing at an arbitrary corpus dir (r17 verdict
item 6): times each named oracle SQL (from a graft.Verify dump's
oracle_sql.json) against the given parquet dir's tables — the DuckDB
half of a paired Spark/oracle window; the Spark half comes from
graft.ScaleCurve on the same dir. Dev-harness only.

Usage: python3 tools/paired.py <sfDir> <verifyOutDir> q27_...,q34_...
"""
import sys, json, time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf, out, names = sys.argv[1], sys.argv[2], sys.argv[3].split(",")
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    if reps < 1:
        sys.exit("reps must be >= 1")
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    # bound the spill so a super-linear replay reports DNF instead of
    # filling the disk (the q139-at-30x finding)
    con.execute("SET max_temp_directory_size = '40GiB'")
    for t in TABLES:
        # ScaleGen writes Spark-style DIRECTORIES named <table>.parquet;
        # the driver testdata ships plain files — accept both
        import os
        p = f"{sf}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    for name in names:
        best = None
        for _ in range(reps):
            t0 = time.time()
            n = len(con.execute(oracle[name]).fetchall())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"[paired] {name}: duckdb={best:.2f}s rows={n}")


if __name__ == "__main__":
    main()
