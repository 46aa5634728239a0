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
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    for name in names:
        best = None
        for _ in range(2):
            t0 = time.time()
            n = len(con.execute(oracle[name]).fetchall())
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        print(f"[paired] {name}: duckdb={best:.2f}s rows={n}")


if __name__ == "__main__":
    main()
