"""Merge chunked graft.Bench outputs into one suite-wide artifact.

Each chunk json is a full Bench result line (per-query map, failed list,
contended flag). The merge unions the per-query maps (a name appearing
in two chunks keeps the min — same estimator as Bench's best-of-two),
unions failed (minus later redemptions), ORs contended, and recomputes
the total. Expected counts come from the caller so a silently-missing
chunk is visible.

Usage: merge_bench.py <out.json> <expected_n> chunk1.json chunk2.json ...
"""
import json
import sys


def main():
    out, expected = sys.argv[1], int(sys.argv[2])
    queries = {}
    failed = set()
    contended = False
    sf = None
    staging = {}
    for p in sys.argv[3:]:
        try:
            c = json.load(open(p))
        except (OSError, ValueError) as e:
            print(f"WARN: unreadable chunk {p}: {e}", file=sys.stderr)
            continue
        for k, v in c.get("queries", {}).items():
            queries[k] = min(queries.get(k, v), v)
        failed |= set(c.get("failed", []))
        contended = contended or bool(c.get("contended"))
        sf = c.get("sf", sf)
        staging.update(c.get("staging_builds", {}))
    failed -= set(queries)  # a later chunk's success redeems
    art = {
        "metric": "total",
        "value": round(sum(queries.values()), 3),
        "unit": "sec",
        "completed": len(queries),
        "expected": expected,
        "failed": sorted(failed),
        "contended": contended,
        "staging_builds": staging,
        "queries": dict(sorted(queries.items())),
        "sf": sf,
    }
    json.dump(art, open(out, "w"), indent=1)
    print(f"merged {len(queries)}/{expected} queries, {len(failed)} failed, "
          f"total {art['value']} s, contended={contended}")


if __name__ == "__main__":
    main()
