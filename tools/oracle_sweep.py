#!/usr/bin/env python3
"""Full-surface oracle sweep with per-query isolation (sf10+ scales).

Usage: python3 tools/oracle_sweep.py <sfDir> <verifyOutDir> <outJson>
           [--timeout SEC] [--mem LIMIT] [--only name ...]

Runs tools/oracle_check.py for ONE query per subprocess so that a
quadratic / non-spillable oracle costs its own timeout instead of the
whole sweep (the sf10 lesson: d_survivor_pick's recursive CTE was
kernel-OOM-killed at 130 GB when run in the shared process).  Records
per-query compare wall time as `sec` (END-TO-END: python+DuckDB startup,
reading the Spark parquet, both compare aggregations — not a baseline
timing) plus the oracle SQL's own execution time as `oracle_sec`
(parsed from oracle_check's oracle_sec= marker); only `oracle_sec` is
usable as a baseline timing source at scales where a second full
serial baseline run would not fit the round budget.

Output JSON: {name: {"status": "pass"|"fail"|"oracle_timeout"|"oracle_error",
                     "sec": wall, "detail": first FAIL line if any}}
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
import sweep_lock  # noqa: E402


def main():
    sweep_lock.acquire()
    sf_dir, out_dir, out_json = sys.argv[1:4]
    args = sys.argv[4:]
    timeout = 600.0
    mem = os.environ.get("ORACLE_DUCKDB_MEMLIMIT", "80GB")
    only = []
    i = 0
    while i < len(args):
        if args[i] == "--timeout":
            timeout = float(args[i + 1]); i += 2
        elif args[i] == "--mem":
            mem = args[i + 1]; i += 2
        elif args[i] == "--only":
            only = args[i + 1:]; break
        else:
            raise SystemExit(f"unknown arg {args[i]}")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    # --only preserves the caller's order (cheap-first scheduling);
    # the default full run stays sorted for determinism.
    names = list(only) if only else sorted(oracles.keys())
    results = {}
    # Resume support: a killed sweep keeps what it already measured.
    if os.path.exists(out_json):
        results = json.load(open(out_json))
    env = dict(os.environ, ORACLE_DUCKDB_MEMLIMIT=mem)
    for n, name in enumerate(names):
        if name in results:
            continue
        t0 = time.monotonic()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(HERE, "oracle_check.py"),
                 sf_dir, out_dir, name],
                capture_output=True, text=True, timeout=timeout, env=env)
            sec = round(time.monotonic() - t0, 3)
            line = next((l for l in p.stdout.splitlines()
                         if l.startswith(("PASS", "FAIL"))), "")
            # `sec` is END-TO-END compare wall time (python+duckdb startup,
            # reading the Spark parquet, both fingerprint aggregations) —
            # NOT a baseline query timing. The oracle SQL's own execution
            # time is parsed from the check's oracle_sec= marker below.
            o_sec = None
            if "oracle_sec=" in line:
                try:
                    o_sec = float(line.rsplit("oracle_sec=", 1)[1].split()[0])
                except ValueError:
                    pass
            if line.startswith("PASS"):
                rows = None
                if "(" in line:
                    try:
                        rows = int(line.split("(")[1].split(" ")[0])
                    except ValueError:
                        pass
                results[name] = {"status": "pass", "sec": sec}
                if rows is not None:
                    results[name]["rows"] = rows
                if o_sec is not None:
                    results[name]["oracle_sec"] = o_sec
                if "[hash-mode]" in line:
                    results[name]["mode"] = "multiset-hash"
            else:
                detail = (line or p.stderr.strip().splitlines()[-1:] or [""])
                if isinstance(detail, list):
                    detail = detail[0] if detail else ""
                if "no spark output" in str(detail):
                    # Engine dump not there (yet) — not a verdict. Leave
                    # the name unrecorded so a resumed sweep retries it
                    # once the Verify side lands the dump.
                    print(f"[{n + 1}/{len(names)}] {name}: skipped "
                          f"(no spark output yet)", flush=True)
                    continue
                status = "fail" if line.startswith("FAIL") else "oracle_error"
                results[name] = {"status": status,
                                 "sec": sec, "detail": str(detail)[:500]}
        except subprocess.TimeoutExpired:
            results[name] = {"status": "oracle_timeout",
                             "sec": round(time.monotonic() - t0, 3)}
        json.dump(results, open(out_json, "w"), indent=1, sort_keys=True)
        r = results[name]
        print(f"[{n + 1}/{len(names)}] {name}: {r['status']} {r['sec']}s"
              + (f" — {r.get('detail', '')[:120]}" if r["status"] not in
                 ("pass",) else ""), flush=True)
    npass = sum(1 for r in results.values() if r["status"] == "pass")
    print(f"== {npass}/{len(results)} pass")


if __name__ == "__main__":
    main()
