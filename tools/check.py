#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py [sfDir] [verifyOutDir]

Reads verifyOutDir/<name>/ parquet (written by graft.Verify) and
verifyOutDir/oracle_sql.json, runs each oracle against the sfDir parquet
tables in DuckDB, sorts columns by name + rows by all columns, and compares
values exactly. Dev-harness only — not part of the Spark library.
"""
import sys, json, glob, math

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    return str(v)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    rows_only = []
    for name in sorted(set(oracle) | {p.split("/")[-1] for p in glob.glob(f"{out}/*") if not p.endswith(".json")}):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        mine = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").fetchdf()
        if name not in oracle:
            rows_only.append((name, len(mine)))
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        mc = sorted(mine.columns)
        rc = sorted(ref.columns)
        if mc != rc:
            print(f"FAIL {name}: columns differ spark={mc} oracle={rc}")
            n_fail += 1
            continue
        a = mine[mc].astype(object).values.tolist()
        b = ref[rc].astype(object).values.tolist()
        a = sorted([[norm(v) for v in r] for r in a])
        b = sorted([[norm(v) for v in r] for r in b])
        if len(a) != len(b):
            print(f"FAIL {name}: rowcount spark={len(a)} oracle={len(b)}")
            n_fail += 1
            continue
        bad = [(i, x, y) for i, (x, y) in enumerate(zip(a, b)) if x != y]
        if bad:
            i, x, y = bad[0]
            print(f"FAIL {name}: {len(bad)}/{len(a)} rows differ; first@{i}\n  spark : {x}\n  oracle: {y}\n  cols  : {mc}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(a)} rows)")
            n_pass += 1
    for name, n in rows_only:
        print(f"ROWS {name} ({n} rows, no oracle)")
    print(f"\n{n_pass} pass, {n_fail} fail, {len(rows_only)} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
