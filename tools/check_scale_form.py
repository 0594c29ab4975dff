#!/usr/bin/env python3
"""Empirical equivalence check for scale-form oracles (dev tool).

For every entry in <verifyOutDir>/oracle_sql_scale.json, run BOTH the
primary oracle SQL (oracle_sql.json) and its scale-form rewrite against
the same testdata parquet in DuckDB, and compare the order-independent
(count, sum-of-row-hashes) digest on name-sorted columns — the same
canonicalization check_oracle_sf10.py uses. Run it at a scale where the
primary form is still tractable (sf0.1): a green row is evidence that
the rewrite is observationally identical there, which together with the
per-rewrite algebraic argument (see SparkEntry.oracleSqlScale scaladoc)
justifies substituting the scale form at sf10+.

Usage: check_scale_form.py <sfDir> <verifyOutDir>
Env: ORACLE_THREADS / ORACLE_MEM / ORACLE_TMP as in check_oracle_sf10.py.
"""
import os, sys, json, time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    import duckdb
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    primary = json.load(open(f"{out_dir}/oracle_sql.json"))
    scale = json.load(open(f"{out_dir}/oracle_sql_scale.json"))
    con = duckdb.connect()
    con.execute(f"SET threads={os.environ.get('ORACLE_THREADS', '32')}")
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
    con.execute("SET preserve_insertion_order=false")
    tmp = os.environ.get("ORACLE_TMP")
    if tmp:
        os.makedirs(tmp, exist_ok=True)
        con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path += "/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    def digest(sql):
        con.execute("CREATE OR REPLACE VIEW __q AS (" + sql + ")")
        cols = sorted(r[0] for r in con.execute("DESCRIBE __q").fetchall())
        sel = ", ".join(f'"{c}"' for c in cols)
        n, h = con.execute(
            f"SELECT count(*), sum(hash({sel})) FROM __q").fetchone()
        return cols, n, h

    bad = 0
    for name in sorted(scale):
        t0 = time.time()
        pc, pn, ph = digest(primary[name])
        sc, sn, sh = digest(scale[name])
        dt = time.time() - t0
        if (pc, pn, ph) == (sc, sn, sh):
            print(f"ok   {name}: primary == scale-form "
                  f"({pn} rows, {dt:.1f}s)", flush=True)
        else:
            bad += 1
            print(f"FAIL {name}: primary ({pn} rows, hash {ph}) != "
                  f"scale-form ({sn} rows, hash {sh})", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
