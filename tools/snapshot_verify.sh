#!/bin/sh
# Snapshot a graft.Verify output dir into artifacts/verify/ for the
# round commit (see README "Round artifacts"). Usage:
#   sbt -batch "runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out"
#   tools/snapshot_verify.sh /tmp/verify_out
set -eu
SRC="${1:-/tmp/verify_out}"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
DST="$REPO/artifacts/verify"
[ -f "$SRC/oracle_sql.json" ] || { echo "no oracle_sql.json under $SRC" >&2; exit 1; }
rm -rf "$DST"
mkdir -p "$DST"
cp -r "$SRC"/. "$DST"/
# parquet write residue that only bloats the commit
find "$DST" -name '*.crc' -delete
echo "snapshotted $(ls "$DST" | wc -l) entries to $DST"
