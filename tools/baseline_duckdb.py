#!/usr/bin/env python3
"""Per-query DuckDB baseline timings, committed beside each round's bench.

Usage: python3 tools/baseline_duckdb.py <sfDir> <oracleSqlJson> [outJson]

Runs every oracle SQL from <oracleSqlJson> (graft.Verify's dump) against the
<sfDir> parquet tables in DuckDB (32 threads, mirroring the bench's
local[32]) and writes {"sf_dir", "duckdb_version", "threads", "total_sec",
"queries": {name: sec}} to outJson (default baseline_duckdb.json). This is
the artifact the judge was re-measuring by hand every round: the bench's
denominator, produced by the same oracle strings the correctness gate runs.
"""
import json, os, sys, time
import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import sweep_lock  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sweep_lock.acquire()
    sf_dir = sys.argv[1]
    sql_json = sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else "baseline_duckdb.json"
    oracles = json.load(open(sql_json))
    con = duckdb.connect()
    con.execute("SET threads TO 32")
    # Same guard as oracle_check: a non-spillable oracle fails ITS row
    # instead of the kernel OOM-killing the sweep (learned at sf10).
    con.execute(
        f"SET memory_limit='{os.environ.get('ORACLE_DUCKDB_MEMLIMIT', '96GB')}'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    times = {}
    failed = {}
    # Optional extra argv names restrict the run (sweep resumes / subsets);
    # BASELINE_TIMEOUT_SEC interrupts any single oracle past the cap via
    # con.interrupt() — a pair-quadratic oracle then costs its cap, not
    # the sweep (the per-query analogue of the memory_limit guard).
    only = set(sys.argv[4:])
    timeout = float(os.environ.get("BASELINE_TIMEOUT_SEC", "0") or 0)
    import threading
    for name in sorted(oracles):
        if only and name not in only:
            continue
        t0 = time.monotonic()
        timer = None
        # Sentinel classifies timeouts EXACTLY (r13 ADVICE): elapsed-time
        # inference relabeled any genuine error near the cap as a timeout.
        fired = threading.Event()

        def _interrupt():
            fired.set()
            con.interrupt()
        if timeout > 0:
            timer = threading.Timer(timeout, _interrupt)
            timer.start()
        try:
            con.execute(oracles[name]).fetchall()
            times[name] = round(time.monotonic() - t0, 4)
        except Exception as e:  # noqa: BLE001 - record, don't abort the sweep
            msg = str(e).splitlines()[0][:200]
            if fired.is_set():
                msg = f"timeout after {timeout:.0f}s: {msg}"
            failed[name] = msg
        finally:
            if timer is not None:
                timer.cancel()
                if fired.is_set():
                    # cancel() doesn't stop an in-flight callback: the
                    # timer thread sets `fired` BEFORE calling
                    # con.interrupt(), so without a join() the absorbing
                    # SELECT 1 below can start and finish before the
                    # interrupt lands — leaving it pending to abort the
                    # NEXT query, the exact failure the absorb exists to
                    # prevent (r14 ADVICE).
                    timer.join()
            if fired.is_set():
                # The timer can fire between fetchall() returning and
                # cancel(): an interrupt landing on an idle connection
                # aborts the NEXT query. Absorb any pending interrupt on
                # a throwaway statement before moving on (r13 ADVICE).
                try:
                    con.execute("SELECT 1").fetchall()
                except Exception:  # noqa: BLE001 - absorbing, by design
                    pass
    out = {
        "sf_dir": sf_dir,
        "duckdb_version": duckdb.__version__,
        "threads": 32,
        "n_queries": len(times),
        "total_sec": round(sum(times.values()), 3),
        "queries": times,
    }
    if failed:
        out["failed"] = failed
    json.dump(out, open(out_json, "w"), indent=1, sort_keys=True)
    print(f"{len(times)} queries, total {out['total_sec']} s -> {out_json}"
          + (f" ({len(failed)} FAILED)" if failed else ""))


if __name__ == "__main__":
    main()
