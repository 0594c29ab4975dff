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

Each entry runs in its own subprocess under ORACLE_TIMEOUT seconds
(default 600) — a primary form that hangs at the chosen scale reports
`timeout` instead of stalling the run. A scale entry with no primary
counterpart reports `no-primary` (a scale form of nothing proves
nothing). On completion the per-entry statuses are merge-written to the
git-TRACKED stamp file evidence/scale_form_ok.json (override with
SCALE_FORM_STAMP) — the pass stamp check_oracle_sf10.py requires before
substituting a scale form. Entries with a probe in
<verifyOutDir>/oracle_margin_probes.json additionally record a `margin`
diagnostic (how close emitted values sit to thresholds / rounding
boundaries) next to their stamp.

Usage: check_scale_form.py <sfDir> <verifyOutDir> [entry ...]
Extra args restrict the run to the named entries; the stamp file is
always MERGED (ran entries updated, other entries' stamps preserved),
so a targeted re-proof after editing one scale form does not discard
the others' evidence. Stale stamps are harmless either way: the
consumer (check_oracle_sf10.py) re-hashes BOTH the scale SQL (sql_sha)
and the primary oracle SQL (primary_sql_sha) against each stamp and
refuses mismatches on either side. To regenerate the whole stamp
file CI-style from the current tree:
  sbt 'runMain graft.Verify /root/testdata/sf0.001 /tmp/v-json nosuch' \
    && python3 tools/check_scale_form.py /root/testdata/sf0.1 /tmp/v-json
(the Verify run only needs to dump the oracle JSONs; `nosuch` skips
every query).
Env: ORACLE_TIMEOUT / ORACLE_THREADS / ORACLE_MEM / ORACLE_TMP as in
check_oracle_sf10.py.
"""
import os, sys, json, time, hashlib
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

TIMEOUT = int(os.environ.get("ORACLE_TIMEOUT", "600"))


def compare_one(sf_dir, name, psql, ssql, probe_sql, q):
    import duckdb
    try:
        con = duckdb.connect()
        con.execute(f"SET threads={os.environ.get('ORACLE_THREADS', '32')}")
        con.execute(
            f"SET memory_limit='{os.environ.get('ORACLE_MEM', '48GB')}'")
        con.execute("SET preserve_insertion_order=false")
        tmp = os.environ.get("ORACLE_TMP")
        if tmp:
            os.makedirs(tmp, exist_ok=True)
            con.execute(f"SET temp_directory='{tmp}'")
        for t in TABLES:
            path = f"{sf_dir}/{t}.parquet"
            if os.path.isdir(path):
                path += "/*.parquet"
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

        def digest(sql):
            con.execute("CREATE OR REPLACE VIEW __q AS (" + sql + ")")
            cols = sorted(r[0] for r in con.execute("DESCRIBE __q").fetchall())
            sel = ", ".join(f'"{c}"' for c in cols)
            n, h = con.execute(
                f"SELECT count(*), sum(hash({sel})) FROM __q").fetchone()
            return cols, n, h

        pc, pn, ph = digest(psql)
        sc, sn, sh = digest(ssql)
        if (pc, pn, ph) == (sc, sn, sh):
            r = {"status": "ok", "rows": pn}
            # optional margin probe (oracle_margin_probes.json): a
            # diagnostic SELECT recording how close the entry's emitted
            # values sit to its thresholds/rounding boundaries — a
            # near-boundary corpus at a bigger SF is then detectable
            # instead of assumed away (e.g. dedup_embcos' round(cos,6))
            if probe_sql:
                row = con.execute(probe_sql).fetchone()
                cols = [d[0] for d in con.description]
                r["margin"] = {c: (float(v) if v is not None else None)
                               for c, v in zip(cols, row)}
            q.put(r)
        else:
            q.put({"status": "fail",
                   "why": f"primary ({pn} rows, hash {ph}) != "
                          f"scale-form ({sn} rows, hash {sh})"})
    except Exception as e:
        q.put({"status": "error", "why": f"{type(e).__name__}: {e}"})


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    primary = json.load(open(f"{out_dir}/oracle_sql.json"))
    scale = json.load(open(f"{out_dir}/oracle_sql_scale.json"))
    probe_path = f"{out_dir}/oracle_margin_probes.json"
    probes = json.load(open(probe_path)) if os.path.exists(probe_path) else {}
    results, bad = {}, 0
    for name in sorted(scale):
        if only and name not in only:
            continue
        if name not in primary:
            results[name] = {"status": "no-primary"}
            print(f"FAIL {name}: scale form has no primary oracle "
                  f"counterpart in oracle_sql.json", flush=True)
            bad += 1
            continue
        t0 = time.time()
        q = mp.Queue()
        p = mp.Process(target=compare_one,
                       args=(sf_dir, name, primary[name], scale[name],
                             probes.get(name), q))
        p.start()
        p.join(TIMEOUT)
        dt = time.time() - t0
        if p.is_alive():
            p.terminate()
            p.join()
            r = {"status": "timeout"}
        else:
            try:
                r = q.get(timeout=15)
            except Exception:
                r = {"status": "error",
                     "why": f"worker died (exit {p.exitcode})"}
        r["sec"] = round(dt, 1)
        # hashes of the exact SQL pair that was proven equivalent — lets
        # check_oracle_sf10.py reject a stamp that predates an edit on
        # EITHER side: a stale scale form (sql_sha) or a primary oracle
        # whose semantics changed after the proof ran (primary_sql_sha)
        r["sql_sha"] = hashlib.sha256(scale[name].encode()).hexdigest()[:16]
        r["primary_sql_sha"] = hashlib.sha256(
            primary[name].encode()).hexdigest()[:16]
        results[name] = r
        if r["status"] == "ok":
            print(f"ok   {name}: primary == scale-form "
                  f"({r['rows']} rows, {r['sec']}s)", flush=True)
        else:
            bad += 1
            print(f"{r['status'].upper()[:4]} {name}: {r.get('why', '')} "
                  f"({r['sec']}s)", flush=True)
    # pass stamp consumed by check_oracle_sf10.py: a scale form may only
    # be substituted when its stamp for THIS verify build says ok. The
    # stamp lives at the git-TRACKED evidence/ path (env-overridable) so
    # the repo itself carries the proof the comparator enforces against.
    # Merge-write: every run updates only the entries it ran (stamps are
    # sql_sha-pinned, so stale entries are inert, never dangerous).
    stamp = os.environ.get("SCALE_FORM_STAMP") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "..", "evidence", "scale_form_ok.json")
    os.makedirs(os.path.dirname(stamp), exist_ok=True)
    merged = {}
    if os.path.exists(stamp):
        merged = json.load(open(stamp)).get("results", {})
    merged.update(results)
    json.dump({"sf_dir": sf_dir, "results": merged},
              open(stamp, "w"), indent=1, sort_keys=True)
    print(f"== {len(results) - bad} ok, {bad} not-ok -> {stamp}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
