#!/usr/bin/env python3
"""Merge check_oracle_sf10.py console logs + result JSONs into one
committed results file, later entries overriding earlier ones, with a
`source` provenance field per entry. Dev tool for assembling the
round's committed oracle_sf10_results.json from the gate's
(necessarily multiple) runs: the full sweep plus targeted retries of
oracle-side resource failures.

Usage: merge_sf10_results.py out.json src1.log src2.json ...
"""
import json, re, sys

def parse_log(path):
    out = {}
    for line in open(path, errors="replace"):
        m = re.match(r"ok   (\S+) \((\d+) rows, ([\d.]+)s\)", line)
        if m:
            out[m.group(1)] = {"status": "ok", "rows": int(m.group(2)),
                               "sec": float(m.group(3))}
            continue
        m = re.match(r"(ERRO|TIME|FAIL) (\S+): (.*?) \(([\d.]+)s\)", line)
        if m:
            st = {"ERRO": "error", "TIME": "timeout", "FAIL": "fail"}[m.group(1)]
            out[m.group(2)] = {"status": st, "why": m.group(3).strip(),
                               "sec": float(m.group(4))}
    return out

def main():
    out_path, srcs = sys.argv[1], sys.argv[2:]
    merged = {}
    for s in srcs:
        entries = (json.load(open(s)) if s.endswith(".json") else parse_log(s))
        for k, v in entries.items():
            v = dict(v)
            v["source"] = s
            merged[k] = v
    json.dump(merged, open(out_path, "w"), indent=1, sort_keys=True)
    ok = sum(1 for v in merged.values() if v["status"] == "ok")
    print(f"{ok} ok / {len(merged)} total -> {out_path}")
    for k, v in sorted(merged.items()):
        if v["status"] != "ok":
            print(f"  {v['status']:7} {k}: {v.get('why','')[:90]}")

if __name__ == "__main__":
    main()
