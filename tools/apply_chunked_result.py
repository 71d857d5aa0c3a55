"""Fold a tools/oracle_chunked.py result into artifacts/CORRECTNESS_sf10.json.

Reads the chunked-compare log, and on a PASS line flips the query's entry
to status 'pass' with the method recorded (the r15 entries for these rows
were 'oracle_infeasible_on_host' — the chunked compare is the same
multiset fingerprint the driver's hash-mode uses, computed per customer
chunk and merged exactly, so a PASS here is a full-strength rows+schema+
fingerprint verdict, not a weaker check). On FAIL it refuses and prints —
a wrong answer must never be absorbed silently. Recomputes the summary.

Usage: apply_chunked_result.py <artifact.json> <name> <chunked.log> <round>
"""
import json
import re
import sys
from collections import Counter


def main():
    art_path, name, log_path, rnd = sys.argv[1:5]
    log = open(log_path).read()
    m = re.search(rf"^(PASS|FAIL) {re.escape(name)} \((\d+) rows\) "
                  rf"\[chunked-hash K=(\d+)\] oracle_sec=([\d.]+)",
                  log, re.M)
    if not m:
        raise SystemExit(f"no chunked verdict for {name} in {log_path}")
    if m.group(1) == "FAIL":
        raise SystemExit(f"REFUSING: chunked compare FAILED for {name} — "
                         "that is a correctness regression, fix it, don't record it")
    art = json.load(open(art_path))
    art["queries"][name] = {
        "status": "pass",
        "method": f"chunked-hash K={m.group(3)} (tools/oracle_chunked.py, "
                  f"round {rnd}): per-custkey-chunk multiset fingerprints "
                  f"merged exactly; {m.group(2)} rows, oracle {m.group(4)} s",
    }
    c = Counter(v["status"] for v in art["queries"].values())
    art["summary"] = {
        "pass": c.get("pass", 0),
        "rows_only_dumped": c.get("rows_only_dumped", 0),
        "FAIL": c.get("FAIL", 0) + c.get("fail", 0),
        "oracled": art.get("summary", {}).get("oracled", 265),
        "other": {k: v["status"] for k, v in sorted(art["queries"].items())
                  if v["status"] not in ("pass", "rows_only_dumped")},
    }
    json.dump(art, open(art_path, "w"), indent=1)
    print(f"{name}: pass recorded ({m.group(2)} rows, K={m.group(3)}); "
          f"summary now pass={art['summary']['pass']} "
          f"other={len(art['summary']['other'])}")


if __name__ == "__main__":
    main()
