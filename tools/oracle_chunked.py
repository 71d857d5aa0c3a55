#!/usr/bin/env python3
"""Chunked DuckDB oracle compare for queries whose oracle dies of spill
at sf10 when run whole (r15 verdict #3).

The full-compare failure mode: the oracle's MATERIALIZED intermediates
(e.g. the geo queries' ~1.2e9-candidate haversine chain) exceed what the
host can spill (>44 GB at 110 GB memory_limit). But when a query's
output — and its whole CTE chain — is keyed by one side's id, injecting
`WHERE id % K = k` into that side's base CTE partitions the output
EXACTLY and shrinks every intermediate K-fold. Each chunk computes the
same multi-component multiset fingerprint oracle_check.py's hash-mode
uses; components merge across chunks (n/h1/h6 sum, h2 xor, h3 min,
h4 max — and h5, count(DISTINCT hash(row)), sums because the chunk
predicate is a function of the row, so chunk hash-sets are disjoint).
The Spark dump is fingerprinted whole (it fits — it's the result, not
the intermediate).

Only queries with a registered recipe can be chunked: the injection
point must partition the output, which is a per-query semantic fact,
not something to guess. Global-closure queries (connected components,
dedup reports over them) have no such axis — they stay named
dispositions.

Usage: oracle_chunked.py <sfDir> <dumpDir> <name> [K]
Env: ORACLE_DUCKDB_MEMLIMIT / ORACLE_DUCKDB_THREADS / ORACLE_DUCKDB_TMPDIR
"""
import glob
import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import sweep_lock

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# name -> (marker, replacement-template) injected into the oracle SQL;
# the marker must occur exactly once and the predicate must partition
# the OUTPUT rows (verified per query when the recipe is added).
RECIPES = {
    # geo: the entire CTE chain is per-customer; suppliers are never
    # chunked, no cross-customer aggregation exists.
    "q_geo_knn": ("FROM customer)",
                  "FROM customer WHERE (c_custkey % {K}) = {k})"),
    "q_geo_join": ("FROM customer)",
                   "FROM customer WHERE (c_custkey % {K}) = {k})"),
}


def fingerprint_sql(cols):
    h = "hash(" + ", ".join(f'"{c}"' for c in sorted(cols)) + ")"
    return (f"SELECT count(*) AS n, sum({h}) AS h1, bit_xor({h}) AS h2, "
            f"min({h}) AS h3, max({h}) AS h4, count(DISTINCT {h}) AS h5, "
            f"sum(hash({h} + 982451653)) AS h6 FROM")


def merge(parts):
    def nz(vals, f, empty):
        vs = [v for v in vals if v is not None]
        return f(vs) if vs else empty
    n = sum(p[0] for p in parts)
    h1 = nz([p[1] for p in parts], sum, None)
    h2 = None
    for p in parts:
        if p[2] is not None:
            h2 = p[2] if h2 is None else h2 ^ p[2]
    h3 = nz([p[3] for p in parts], min, None)
    h4 = nz([p[4] for p in parts], max, None)
    h5 = sum(p[5] for p in parts)
    h6 = nz([p[6] for p in parts], sum, None)
    return (n, h1, h2, h3, h4, h5, h6)


def main():
    sf_dir, dump_dir, name = sys.argv[1:4]
    k_chunks = int(sys.argv[4]) if len(sys.argv) > 4 else 16
    if name not in RECIPES:
        raise SystemExit(f"no chunk recipe for {name}; known: {sorted(RECIPES)}")
    sql = json.load(open(f"{dump_dir}/oracle_sql.json"))[name]
    marker, repl = RECIPES[name]
    if sql.count(marker) != 1:
        raise SystemExit(f"marker {marker!r} occurs {sql.count(marker)}x in "
                         f"{name}'s oracle — recipe stale, refusing")
    spark_files = glob.glob(f"{dump_dir}/{name}/*.parquet")
    if not spark_files:
        raise SystemExit(f"no spark dump at {dump_dir}/{name}")

    sweep_lock.acquire()
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEMLIMIT', '48GB')}'")
    thr = os.environ.get("ORACLE_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads TO {int(thr)}")
    tmpd = os.environ.get("ORACLE_DUCKDB_TMPDIR")
    if tmpd:
        os.makedirs(tmpd, exist_ok=True)
        con.execute(f"SET temp_directory='{tmpd}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    srel = con.sql(f"SELECT * FROM read_parquet({spark_files!r})")
    scols = list(srel.columns)
    # schema + dtype-class check against chunk 0's shape (oracle_check's
    # dtype_check equivalence classes, inlined minimally: HUGEINT or a
    # decimal/double split would diverge at the driver even if values match)
    chunk0 = sql.replace(marker, repl.format(K=k_chunks, k=0))
    orel0 = con.sql(chunk0).limit(0)
    ocols = list(orel0.columns)
    if sorted(scols) != sorted(ocols):
        print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
        return 1
    import oracle_check as oc
    problems = oc.dtype_check(name, scols, [str(t) for t in srel.types],
                              ocols, [str(t) for t in orel0.types])
    if problems:
        print(f"FAIL {name}: dtype divergence: " + "; ".join(problems))
        return 1

    agg = fingerprint_sql(scols)
    sh = con.sql(f"{agg} read_parquet({spark_files!r})").fetchone()
    parts = []
    t0 = time.monotonic()
    for k in range(k_chunks):
        ck = sql.replace(marker, repl.format(K=k_chunks, k=k))
        t1 = time.monotonic()
        parts.append(con.sql(f"{agg} ({ck}) __o").fetchone())
        print(f"  chunk {k + 1}/{k_chunks}: {parts[-1][0]} rows "
              f"{time.monotonic() - t1:.1f} s", flush=True)
    oh = merge(parts)
    o_sec = time.monotonic() - t0
    if sh[0] != oh[0]:
        print(f"FAIL {name}: rows {sh[0]} != {oh[0]} [chunked-hash K={k_chunks}] "
              f"oracle_sec={o_sec:.1f}")
        return 1
    if tuple(sh[1:]) != tuple(oh[1:]):
        print(f"FAIL {name}: multiset fingerprint differs over {sh[0]} rows "
              f"[chunked-hash K={k_chunks}] oracle_sec={o_sec:.1f}")
        return 1
    print(f"PASS {name} ({sh[0]} rows) [chunked-hash K={k_chunks}] "
          f"oracle_sec={o_sec:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
