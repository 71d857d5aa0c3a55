#!/usr/bin/env python3
"""Assemble a full-surface CORRECTNESS_<sf>.json from a sweep run.

Usage: python3 tools/merge_correctness.py <verifyOutDir> <sweepJson>
           <outJson> <sfDir> [carryJson]

Per-key disposition, covering EVERY registered query:
  - oracled + sweep pass          -> {"status": "pass", "rows", "sec"}
  - oracled + sweep fail          -> {"status": "FAIL", "detail"}   (loud)
  - oracled + sweep timeout/error -> oracle_* status with the sweep detail
  - no oracle, dump present       -> {"status": "rows_only_dumped", "rows"}
  - no dump (engine side capped / excluded) -> carried disposition from
    carryJson if present, else {"status": "engine_not_attempted"}

carryJson is a previous CORRECTNESS artifact whose named-infeasible
dispositions (with their "why") survive runs that deliberately skip those
queries.
"""
import glob
import json
import os
import sys

import duckdb


def main():
    out_dir, sweep_json, out_json, sf_dir = sys.argv[1:5]
    carry = {}
    if len(sys.argv) > 5:
        c = json.load(open(sys.argv[5]))
        carry = c.get("queries", c)
    sweep = json.load(open(sweep_json)) if os.path.exists(sweep_json) else {}
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # Registered key set = oracle keys + dumped dirs + carried keys.
    dumped = {os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
              if os.path.isdir(p)}
    keys = sorted(set(oracles) | dumped | set(carry))
    con = duckdb.connect()
    queries = {}
    n_pass = n_fail = n_rows_only = 0
    for k in keys:
        if k in sweep and k in oracles:
            r = sweep[k]
            if r["status"] == "pass":
                e = {"status": "pass", "sec": r["sec"]}
                if "rows" in r:
                    e["rows"] = r["rows"]
                if "mode" in r:
                    e["mode"] = r["mode"]
                queries[k] = e
                n_pass += 1
            elif r["status"] == "fail":
                queries[k] = {"status": "FAIL", "sec": r["sec"],
                              "detail": r.get("detail", "")}
                n_fail += 1
            else:
                queries[k] = {"status": r["status"], "sec": r["sec"],
                              "why": r.get("detail", "")}
        elif k in dumped and k not in oracles:
            files = glob.glob(f"{out_dir}/{k}/*.parquet")
            rows = con.sql(
                f"SELECT count(*) FROM read_parquet({files!r})").fetchone()[0] \
                if files else 0
            queries[k] = {"status": "rows_only_dumped", "rows": rows}
            n_rows_only += 1
        elif k not in dumped and k in carry \
                and (carry[k].get("status", "").startswith("engine_")
                     or "infeasible" in carry[k].get("status", "")):
            # Carried dispositions apply ONLY while the engine output is
            # absent: a fresh dump must take the oracle_pending/rows_only
            # path below, never be masked by a stale engine_* verdict
            # (r13 ADVICE).
            queries[k] = carry[k]
        elif k not in dumped:
            queries[k] = {"status": "engine_not_attempted"}
        elif k in oracles:
            queries[k] = {"status": "oracle_pending",
                          "note": "engine output dumped; DuckDB compare "
                                  "not yet run in this sweep"}
        else:
            queries[k] = {"status": "dumped_no_oracle_entry"}
    summary = {
        "oracled": sum(1 for k in keys if k in oracles),
        "pass": n_pass,
        "FAIL": n_fail,
        "rows_only_dumped": n_rows_only,
        "other": {k: v["status"] for k, v in queries.items()
                  if v["status"] not in ("pass", "rows_only_dumped")},
    }
    json.dump({"sf_dir": sf_dir, "summary": summary, "queries": queries},
              open(out_json, "w"), indent=1, sort_keys=True)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
