"""Compare a merged bench artifact against a DuckDB baseline json.

Prints the matched-subset aggregate ratio and every matched row whose
engine/oracle ratio exceeds a threshold (default 2.0), plus unmatched
engine rows sorted by absolute time — the ">2x rows, each named" view
the round verdicts ask for.

Usage: bench_vs_baseline.py <bench.json> <baseline.json> [threshold]
"""
import json
import sys


def main():
    bench = json.load(open(sys.argv[1]))
    base = json.load(open(sys.argv[2]))
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    bq = bench["queries"]
    oq = {k: v["sec"] if isinstance(v, dict) else v
          for k, v in base["queries"].items()}
    matched = sorted(set(bq) & set(oq))
    s_sum = sum(bq[k] for k in matched)
    o_sum = sum(oq[k] for k in matched)
    print(f"matched {len(matched)} queries: engine {s_sum:.1f} s vs "
          f"baseline {o_sum:.1f} s = {s_sum / o_sum:.2f}x aggregate")
    over = [(bq[k] / oq[k], k) for k in matched if bq[k] / oq[k] > thr]
    print(f"\n{len(over)} matched rows over {thr}x:")
    for r, k in sorted(over, reverse=True):
        print(f"  {r:7.1f}x  {k}: {bq[k]:.2f} s vs {oq[k]:.2f} s")
    un = sorted(((v, k) for k, v in bq.items() if k not in oq), reverse=True)
    print(f"\nunmatched engine rows (no baseline), top 15 by time:")
    for v, k in un[:15]:
        print(f"  {v:8.2f} s  {k}")
    if bench.get("failed"):
        print(f"\nfailed: {bench['failed']}")
    if bench.get("contended"):
        print("\nWARNING: bench tagged contended")


if __name__ == "__main__":
    main()
