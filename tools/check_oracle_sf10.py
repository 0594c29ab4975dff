#!/usr/bin/env python3
"""Scale-out stand-in for the driver's correctness gate (dev tool only,
not part of the shipped library), built for sf10+ where check_oracle.py's
pandas-stringify compare would need tens of GB: the whole comparison runs
INSIDE DuckDB.

Per query: register the Spark result parquet and the oracle SQL as views,
select both sides' columns sorted by name (the driver's canonicalization),
then compare an order-independent multiset DIGEST: row count plus the sum
of per-row `hash(cols...)` values. This is O(1) comparison memory at any
result size (a literal EXCEPT ALL on wide list columns exhausted
vm.max_map_count at sf10), but it is a strictly WEAKER guarantee than a
typed multiset diff: two different multisets whose 64-bit row-hash sums
happen to cancel would compare equal. That failure mode needs engineered
collisions, not the independent-engine bugs this gate hunts — treat a
green row as digest-level evidence, same class as the driver's own
value-hash gate, not as a bit-exact proof.

Each query runs in its own process under a wall-clock budget
(ORACLE_TIMEOUT seconds, default 600): an oracle that cannot complete at
this scale is reported as `timeout`/`error` and belongs on the documented
allowlist, never silently skipped. `--allow n1,n2` marks those entries
expected-not-ok (recorded with `"allowed": true`, excluded from the exit
code) — the committed results JSON must carry the reason next to each.

DuckDB knobs: ORACLE_THREADS (default 32), ORACLE_MEM (default 48GB),
ORACLE_TMP (when set: `SET temp_directory` — point spills at the volume
with headroom; the default `.tmp` lives in cwd and filled the root
volume at sf10). ORACLE_TMP_BUDGET_GB (default 60) is a temp-spill
watchdog: the parent polls the temp directory's size while the worker
runs and kills it with status `disk` when the budget is crossed —
a pair-join oracle that would fill the volume fails in seconds with an
actionable status instead of burning 10+ minutes and dying on ENOSPC.

Scale-form substitution requires a pass stamp: an entry in
oracle_sql_scale.json is only substituted when scale_form_ok.json
(written by a passing tools/check_scale_form.py run; path overridable
via SCALE_FORM_STAMP) records status ok AND a sql_sha matching the
current scale SQL AND a primary_sql_sha matching the out-dir's current
primary oracle (so a semantically edited primary can never be gated
against a stamp proven for the old text). An unstamped or stale scale
form is reported as status `unstamped` (allowlistable, never silently
used); each substituted entry records scale_sql_source so an audit can
see whether the SQL came from the build's own out-dir or the tracked
evidence/ mirror.

Usage: check_oracle_sf10.py <sfDir> <verifyOutDir> [resultJson]
       [--allow n1,n2] [query ...]
"""
import os, sys, json, time, hashlib
import multiprocessing as mp

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

TIMEOUT = int(os.environ.get("ORACLE_TIMEOUT", "600"))
THREADS = int(os.environ.get("ORACLE_THREADS", "32"))
MEM = os.environ.get("ORACLE_MEM", "48GB")
TMP_BUDGET = float(os.environ.get("ORACLE_TMP_BUDGET_GB", "60")) * 1e9


def clean_spill(tmp_dir):
    """Remove a killed worker's DuckDB spill (a terminated DuckDB never
    cleans up after itself; one leaked pair-join leaves tens of GB and
    starves every later oracle). An explicit ORACLE_TMP dir is ours to
    delete wholesale; the default cwd `.tmp` is shared, so only DuckDB's
    own spill files are removed from it."""
    if not os.path.isdir(tmp_dir):
        return
    import shutil
    if os.environ.get("ORACLE_TMP"):
        shutil.rmtree(tmp_dir, ignore_errors=True)
    else:
        for f in os.listdir(tmp_dir):
            if f.startswith("duckdb"):
                try:
                    os.remove(os.path.join(tmp_dir, f))
                except OSError:
                    pass


def dir_bytes(path):
    total = 0
    for root, _, files in os.walk(path, onerror=lambda e: None):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def compare_one(sf_dir, out_dir, name, sql, q):
    import duckdb
    try:
        con = duckdb.connect()
        con.execute(f"SET threads={THREADS}")
        con.execute(f"SET memory_limit='{MEM}'")
        # the digest compare is order-independent, so give DuckDB's
        # blocking operators (hash join/agg build sides) license to drop
        # row order — a large memory/temp-spill reduction on the
        # pair-join-shaped dedup oracles
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
        con.execute(f"CREATE VIEW __spark AS SELECT * FROM "
                    f"read_parquet('{out_dir}/{name}/*.parquet')")
        con.execute(f"CREATE VIEW __oracle AS ({sql})")
        scols = sorted(r[0] for r in con.execute("DESCRIBE __spark").fetchall())
        ocols = sorted(r[0] for r in con.execute("DESCRIBE __oracle").fetchall())
        if scols != ocols:
            q.put({"status": "fail", "why": f"columns {scols} != {ocols}"})
            return
        sel = ", ".join(f'"{c}"' for c in scols)
        # order-independent multiset digest: (count, sum-of-row-hashes) —
        # O(1) comparison memory regardless of result size (an EXCEPT ALL
        # on wide list columns exhausted vm.max_map_count at sf10), and
        # the same class of evidence as the driver's value-hash gate
        n_s, h_s = con.execute(
            f"SELECT count(*), sum(hash({sel})) FROM __spark").fetchone()
        n_o, h_o = con.execute(
            f"SELECT count(*), sum(hash({sel})) FROM __oracle").fetchone()
        if n_s != n_o:
            q.put({"status": "fail", "why": f"rows {n_s} != {n_o}",
                   "spark_rows": n_s, "oracle_rows": n_o})
        elif h_s != h_o:
            q.put({"status": "fail", "why": f"row-hash sum {h_s} != {h_o}",
                   "spark_rows": n_s, "oracle_rows": n_o})
        else:
            q.put({"status": "ok", "rows": n_s})
    except Exception as e:
        q.put({"status": "error", "why": f"{type(e).__name__}: {e}"})


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    result_path = None
    if rest and rest[0].endswith(".json"):
        result_path, rest = rest[0], rest[1:]
    allowed = set()
    if "--allow" in rest:
        i = rest.index("--allow")
        allowed = set(rest[i + 1].split(","))
        rest = rest[:i] + rest[i + 2:]
    only = set(rest)
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # scale-form substitutions (algebraically identical rewrites of
    # primary oracles whose join shape is infeasible at sf10+; see
    # SparkEntry.oracleSqlScale and tools/check_scale_form.py for the
    # sf0.1 digest-equivalence evidence). Entries compared against a
    # scale form are recorded with "scale_form": true.
    # the out-dir copy (dumped by Verify from the current tree) wins;
    # the tracked evidence/ mirror serves audits and fresh clones
    scale_path = f"{out_dir}/oracle_sql_scale.json"
    if not os.path.exists(scale_path):
        scale_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "..", "evidence", "oracle_sql_scale.json")
    scale = json.load(open(scale_path)) if os.path.exists(scale_path) else {}
    # pass stamp from tools/check_scale_form.py — a scale form is only
    # substituted when its stamp says ok for the SAME SQL text. The
    # default is the git-TRACKED copy (evidence/scale_form_ok.json), so
    # a fresh clone can audit a results JSON without re-running the
    # sf0.1 digest proofs; a per-out-dir copy is a legacy fallback.
    evidence_stamp = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                  "..", "evidence", "scale_form_ok.json")
    stamp_path = os.environ.get("SCALE_FORM_STAMP") or (
        evidence_stamp if os.path.exists(evidence_stamp)
        else f"{out_dir}/scale_form_ok.json")
    stamp = (json.load(open(stamp_path)).get("results", {})
             if os.path.exists(stamp_path) else {})
    tmp_dir = os.environ.get("ORACLE_TMP") or ".tmp"
    results, n_ok = {}, 0
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        scale_form = name in scale
        if scale_form:
            st = stamp.get(name, {})
            sha = hashlib.sha256(scale[name].encode()).hexdigest()[:16]
            # the primary sha pin: a stamp proves scale ≡ primary for a
            # SPECIFIC primary text. If the primary oracle was edited
            # after the proof (semantic change) while the scale form was
            # not, substituting would gate against the OLD semantics —
            # refuse unless the stamp's primary_sql_sha matches the
            # out-dir's current oracle_sql.json. (Pre-r17 stamps lack the
            # field; they are treated as unstamped and must be re-proven.)
            psha = hashlib.sha256(sql.encode()).hexdigest()[:16]
            if (st.get("status") != "ok" or st.get("sql_sha") != sha
                    or st.get("primary_sql_sha") != psha):
                why = ("no scale_form_ok.json stamp" if not st else
                       f"stamp status={st.get('status')} "
                       f"sql_sha={st.get('sql_sha')} vs current {sha}, "
                       f"primary_sql_sha={st.get('primary_sql_sha')} "
                       f"vs current {psha}")
                results[name] = {"status": "unstamped", "why": why,
                                 "scale_form": True}
                print(f"UNST {name}: {why}", flush=True)
                continue
            sql = scale[name]
        if not os.path.exists(f"{out_dir}/{name}"):
            results[name] = {"status": "error", "why": "no Spark output"}
            print(f"ERR  {name}: no Spark output", flush=True)
            continue
        t0 = time.time()
        q = mp.Queue()
        p = mp.Process(target=compare_one,
                       args=(sf_dir, out_dir, name, sql, q))
        p.start()
        # poll instead of one long join: the temp-spill watchdog kills a
        # worker whose spill crosses the budget (it would otherwise fill
        # the volume, fail with ENOSPC after many minutes, and leave the
        # box wedged for every later oracle)
        status = None
        while True:
            p.join(min(5, TIMEOUT))
            if not p.is_alive():
                break
            if time.time() - t0 >= TIMEOUT:
                status = "timeout"
                break
            if os.path.isdir(tmp_dir) and dir_bytes(tmp_dir) > TMP_BUDGET:
                status = "disk"
                break
        dt = time.time() - t0
        if status is not None:
            p.terminate()
            p.join()
            # observed: 29 GB of spill left behind after one kill
            clean_spill(tmp_dir)
            results[name] = {"status": status, "sec": round(dt, 1)}
            why = (f"oracle exceeded {TIMEOUT}s" if status == "timeout" else
                   f"temp spill in {tmp_dir} crossed "
                   f"{TMP_BUDGET / 1e9:.0f} GB — author a scale form "
                   f"(oracle_sql_scale.json) or raise ORACLE_TMP_BUDGET_GB")
            results[name]["why"] = why
            print(f"{status.upper()[:4]} {name}: {why}", flush=True)
            continue
        # blocking get with a grace period: the worker's result can still
        # be in the queue's feeder pipe right after join() returns —
        # q.empty() is transiently True there (bit tokenize_ids once)
        try:
            r = q.get(timeout=15)
        except Exception:
            r = {"status": "error",
                 "why": f"worker died (exit {p.exitcode})"}
            # a worker killed from OUTSIDE the watchdog (kernel OOM
            # killer, SIGKILL) leaks its spill exactly like a watchdog
            # kill does — clean the same way (both tmp flavors)
            clean_spill(tmp_dir)
        r["sec"] = round(dt, 1)
        if scale_form:
            r["scale_form"] = True
            # provenance: which file the substituted SQL came from — an
            # out-dir copy is from the same build as the Spark outputs;
            # the evidence/ mirror is a cross-tree fallback an auditor
            # should know about (the primary_sql_sha pin above already
            # guarantees it matches this out-dir's primary semantics)
            r["scale_sql_source"] = os.path.relpath(scale_path)
            # residual risk recorded next to the entry: a scale form may
            # share a rewrite identity with the engine's own lowering, so
            # this row is NOT algorithmically independent evidence — the
            # sf0.01 gate (primary form) and the sf0.1 digest stamp are
            r["scale_form_note"] = ("compared against the stamped scale "
                                    "form, not the primary oracle; see "
                                    "oracle_sql_scale.json provider "
                                    "scaladoc for the shared-identity "
                                    "argument")
        results[name] = r
        if r["status"] == "ok":
            n_ok += 1
            print(f"ok   {name} ({r['rows']} rows, {r['sec']}s)", flush=True)
        else:
            print(f"{r['status'].upper()[:4]} {name}: "
                  f"{r.get('why', '')} ({r['sec']}s)", flush=True)
    for k in results:
        if k in allowed and results[k]["status"] != "ok":
            results[k]["allowed"] = True
    bad = {k: v for k, v in results.items()
           if v["status"] != "ok" and not v.get("allowed")}
    n_allowed = sum(1 for v in results.values() if v.get("allowed"))
    print(f"== {n_ok} ok, {len(bad)} not-ok, "
          f"{n_allowed} allowlisted of {len(results)}")
    for k, v in bad.items():
        print(f"   {k}: {v['status']} {v.get('why', '')}")
    if result_path:
        json.dump(results, open(result_path, "w"), indent=1, sort_keys=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
