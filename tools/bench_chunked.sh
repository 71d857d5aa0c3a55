#!/bin/sh
# Chunked graft.Bench sweep: one fresh JVM per chunk of queries, so a
# wedged teardown or an OOM-prone query costs its chunk, not the round's
# whole measurement window (r15: one 90 GB JVM for the full sf10 suite
# ignored SIGTERM in teardown and the suite-wide sf10 number went stale).
# Each chunk writes its own SPARK_GRAFT_BENCH_OUT json; merge with
# tools/merge_bench.py. Name-restricted Bench runs skip the staging
# prebuild, so per-dataset staged tables land inside pass 1 of their
# first consumer and best-of-two reports the steady-state time.
# Usage: tools/bench_chunked.sh <classesSnap> <sfDir> <outPrefix> <chunkSize> <logFile> name...
set -eu
SNAP="$1"; SF="$2"; OUTP="$3"; CHUNK="$4"; LOG="$5"; shift 5
HERE="$(cd "$(dirname "$0")" && pwd)"
i=0
while [ "$#" -gt 0 ]; do
  batch=""
  n=0
  while [ "$#" -gt 0 ] && [ "$n" -lt "$CHUNK" ]; do
    batch="$batch $1"; shift; n=$((n+1))
  done
  i=$((i+1))
  echo "=== chunk $i ($(date +%H:%M:%S)):$batch" >> "$LOG"
  # shellcheck disable=SC2086
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_OUT="${OUTP}_$i.json" \
    "$HERE/run_main.sh" "$SNAP" graft.Bench $batch \
    >> "$LOG" 2>&1 || echo "chunk $i EXITED NONZERO rc=$?" >> "$LOG"
done
echo "=== chunked bench done ($(date +%H:%M:%S))" >> "$LOG"
