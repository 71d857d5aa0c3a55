#!/bin/sh
# Chunked graft.Verify sweep: one fresh JVM per chunk of queries, so a
# single degraded/OOM-prone query costs its chunk, not the whole sweep
# (the sf10 lesson: ~250 heavyweight queries in one 64g JVM accumulate
# enough heap pressure that a capped-but-racing query can OOM the
# SparkContext and every query behind it records "stopped SparkContext").
# Usage: tools/verify_chunked.sh <classesSnap> <sfDir> <outDir> <chunkSize> <logPrefix> name...
set -eu
SNAP="$1"; SF="$2"; OUT="$3"; CHUNK="$4"; LOGP="$5"; shift 5
HERE="$(cd "$(dirname "$0")" && pwd)"
i=0
set -- "$@"
while [ "$#" -gt 0 ]; do
  batch=""
  n=0
  while [ "$#" -gt 0 ] && [ "$n" -lt "$CHUNK" ]; do
    batch="$batch $1"; shift; n=$((n+1))
  done
  i=$((i+1))
  echo "=== chunk $i: $batch" >> "${LOGP}.log"
  # shellcheck disable=SC2086
  "$HERE/run_main.sh" "$SNAP" graft.Verify "$SF" "$OUT" $batch \
    >> "${LOGP}.log" 2>&1 || echo "chunk $i EXITED NONZERO" >> "${LOGP}.log"
done
echo "=== chunked sweep done" >> "${LOGP}.log"
