#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only, not
part of the shipped library): reads Verify.scala's output directory,
runs each oracle SQL in DuckDB with views over the same parquet tables,
and compares the two results the way the driver does — Spark parquet via
pandas/pyarrow, oracle via duckdb .df(), rows sorted by all columns,
values compared STRINGIFIED AND BIT-EXACT (no float rounding: a decimal
column that prints '139345.00' will NOT match a double '139345.0', and a
last-bit double difference fails). Query outputs must therefore avoid
DECIMAL and ARRAY columns and be bit-deterministic.

Usage: check_oracle.py <sfDir> <verifyOutDir> [query ...]
"""
import os, sys, json
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    cols = sorted(df.columns)
    df = df[cols]
    if len(df):
        df = df.sort_values(by=cols)
    return cols, df.astype(str).values.tolist()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):  # Spark-written table = directory of parts
            path += "/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
            exp = con.execute(sql).df()
            gc, gr = canon(got)
            ec, er = canon(exp)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if gc != ec:
            print(f"FAIL {name}: columns {gc} != {ec}")
            n_bad += 1
        elif gr != er:
            diff = [(a, b) for a, b in zip(gr, er) if a != b][:2]
            print(f"FAIL {name}: {len(gr)} vs {len(er)} rows; first diffs: {diff}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(gr)} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} fail")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
