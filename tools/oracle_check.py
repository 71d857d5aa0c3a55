#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB against the sfDir parquet
tables, and compares: row count, column names, and values (rows sorted,
columns sorted by name, floats compared on their exact IEEE-754 bit image).
"""
import json, math, struct, sys, glob, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm_val(v):
    if isinstance(v, float):
        # Bit-exact: the driver hashes the raw parquet bytes, so a 1-ulp
        # drift IS a driver FAIL. Rounds 1/7/8 all shipped "green locally,
        # red at the driver" because this compare rounded to 9 sig digits.
        if math.isnan(v):
            return "NaN"  # canonicalize NaN payloads (the Python float
            # path already collapses them before this compare)
        # NO -0.0 canonicalization: the driver hashes raw parquet bytes,
        # and -0.0/+0.0 have different byte images — a sign-of-zero
        # divergence must be RED here too, not green-locally-red-there
        # (the exact gap the bit-image compare exists to close).
        return struct.pack(">d", v).hex()
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_val(r[i]) for i in idx) for r in rows]
    out.sort()
    return sorted(c for c in cols), out

# The driver's hash is dtype-sensitive in ways string comparison is not:
# round 1 (q_sessionize/q_json_extract) and round 7 (q_ks_test/q_winsorize)
# both shipped "green locally, red at the driver" because a DuckDB
# sum()/sum(CASE...) output was typed HUGEINT while Spark emitted BIGINT.
# Classify each column's type into the driver-relevant equivalence class;
# the driver tolerates integer WIDTH differences (BIGINT vs INTEGER) but
# not representation-class differences (HUGEINT, DECIMAL-vs-DOUBLE).
def dtype_class(duck_type_name):
    t = duck_type_name.upper()
    if "HUGEINT" in t:
        return "HUGEINT"  # never acceptable — always a latent driver FAIL
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
             "USMALLINT", "UINTEGER", "UBIGINT") or "INT" in t:
        return "int"
    if t.startswith("DECIMAL") or t.startswith("NUMBER"):
        return "decimal"
    if t in ("FLOAT", "REAL", "DOUBLE"):
        return "float"
    if t in ("VARCHAR", "TEXT", "STRING", "CHAR", "BPCHAR"):
        return "str"
    return t

def dtype_check(name, scols, sdesc_types, ocols, odesc_types):
    """Return a list of human-readable dtype divergences (empty = clean)."""
    stypes = dict(zip(scols, sdesc_types))
    otypes = dict(zip(ocols, odesc_types))
    problems = []
    for c in sorted(set(scols) & set(ocols)):
        sc, oc = dtype_class(stypes[c]), dtype_class(otypes[c])
        if oc == "HUGEINT":
            problems.append(
                f"{c}: oracle is HUGEINT (un-cast sum()?) — wrap in CAST(... AS BIGINT)")
        elif sc == "HUGEINT":
            problems.append(f"{c}: spark output is HUGEINT-class")
        elif sc != oc:
            problems.append(f"{c}: spark {stypes[c]}({sc}) vs oracle {otypes[c]}({oc})")
    return problems

def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # Cap DuckDB so an oracle that cannot spill (list aggregates over a
    # quadratic intermediate) fails with an OOM error for ITS row instead
    # of the kernel OOM-killing the whole sweep (learned at sf10).
    lim = os.environ.get("ORACLE_DUCKDB_MEMLIMIT", "48GB")
    con.execute(f"SET memory_limit='{lim}'")
    thr = os.environ.get("ORACLE_DUCKDB_THREADS")
    if thr:
        con.execute(f"SET threads TO {int(thr)}")
    # Explicit spill dir with headroom: the sf10 sweep lost 3 queries to
    # "No space left on device" writing the default cwd-relative ".tmp".
    tmpd = os.environ.get("ORACLE_DUCKDB_TMPDIR")
    if tmpd:
        os.makedirs(tmpd, exist_ok=True)
        con.execute(f"SET temp_directory='{tmpd}'")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not spark_files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            # con.sql (relation API), not con.execute: the DB-API cursor
            # description collapses every numeric to 'NUMBER', which is
            # exactly the blindness that let HUGEINT drift ship twice.
            srel = con.sql(f"SELECT * FROM read_parquet({spark_files!r})")
            scols = list(srel.columns)
            stypes = [str(t) for t in srel.types]
            # Outputs past this row count don't fit a Python fetchall at
            # sf10+ (60M-row tuples = tens of GB); compare them as an
            # order-independent multiset hash computed INSIDE DuckDB on
            # both sides instead. Strict bit-image compare still runs at
            # every gate scale below the threshold.
            hash_rows = int(os.environ.get("ORACLE_HASHMODE_ROWS", "2000000"))
            n_spark = con.sql(
                f"SELECT count(*) FROM read_parquet({spark_files!r})").fetchone()[0]
            if n_spark >= hash_rows:
                orel0 = con.sql(sql).limit(0)
                ocols = list(orel0.columns)
                otypes = [str(t) for t in orel0.types]
                dtype_problems = dtype_check(name, scols, stypes, ocols, otypes)
                if dtype_problems:
                    print(f"FAIL {name}: dtype divergence (driver hash would "
                          f"differ): " + "; ".join(dtype_problems))
                    n_fail += 1
                    continue
                if sorted(scols) != sorted(ocols):
                    print(f"FAIL {name}: columns {sorted(scols)} != {sorted(ocols)}")
                    n_fail += 1
                    continue
                cols = ", ".join(f'"{c}"' for c in sorted(scols))
                # Multi-component fingerprint, not a bare sum(hash): additive
                # sums are not collision-resistant for multisets (two rows
                # whose hash deltas cancel compare equal). Combining sum,
                # xor, min/max, distinct-count and a salted double-hash sum
                # means cancellation must hold simultaneously across
                # independent mixes.
                h = f"hash({cols})"
                agg = (f"SELECT count(*) AS n, sum({h}) AS h1, "
                       f"bit_xor({h}) AS h2, min({h}) AS h3, max({h}) AS h4, "
                       f"count(DISTINCT {h}) AS h5, "
                       f"sum(hash({h} + 982451653)) AS h6 FROM")
                sh = con.sql(
                    f"{agg} read_parquet({spark_files!r})").fetchone()
                t_o = time.monotonic()
                oh = con.sql(f"{agg} ({sql}) __o").fetchone()
                o_sec = time.monotonic() - t_o
                if sh[0] != oh[0]:
                    print(f"FAIL {name}: rows {sh[0]} != {oh[0]} [hash-mode]"
                          f" oracle_sec={o_sec:.3f}")
                    n_fail += 1
                elif sh[1:] != oh[1:]:
                    print(f"FAIL {name}: multiset fingerprint differs over "
                          f"{sh[0]} rows [hash-mode] oracle_sec={o_sec:.3f}")
                    n_fail += 1
                else:
                    print(f"PASS {name} ({sh[0]} rows) [hash-mode]"
                          f" oracle_sec={o_sec:.3f}")
                    n_pass += 1
                continue
            srows = srel.fetchall()
            t_o = time.monotonic()
            orel = con.sql(sql)
            ocols = list(orel.columns)
            otypes = [str(t) for t in orel.types]
            orows = orel.fetchall()
            o_sec = time.monotonic() - t_o
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        dtype_problems = dtype_check(name, scols, stypes, ocols, otypes)
        sc, sr = norm_rows(scols, srows)
        oc, orr = norm_rows(ocols, orows)
        if dtype_problems:
            print(f"FAIL {name}: dtype divergence (driver hash would differ): "
                  + "; ".join(dtype_problems))
            n_fail += 1
        elif sc != oc:
            print(f"FAIL {name}: columns {sc} != {oc}")
            n_fail += 1
        elif len(sr) != len(orr):
            print(f"FAIL {name}: rows {len(sr)} != {len(orr)}")
            n_fail += 1
        elif sr != orr:
            diffs = [(a, b) for a, b in zip(sr, orr) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g. {diffs}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sr)} rows) oracle_sec={o_sec:.3f}")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2],
                  set(sys.argv[3:]) if len(sys.argv) > 3 else None))
