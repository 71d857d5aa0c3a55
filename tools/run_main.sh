#!/bin/sh
# Run a graft main against a SNAPSHOT of the compiled classes, bypassing
# sbt — so long background runs (the sf1 verify/bench sweeps) don't hold
# the sbt project lock and don't see classes recompiled mid-run.
# Usage: tools/run_main.sh <snapshotDir> <mainClass> [args...]
#   tools/run_main.sh /tmp/graft/classes_v1 graft.Verify /tmp/graft/sf1 /tmp/graft/verify_sf1
set -eu
SNAP="$1"; MAIN="$2"; shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
if [ ! -d "$SNAP" ]; then
  mkdir -p "$SNAP"
  cp -r "$REPO/target/scala-2.13/classes/." "$SNAP/"
fi
exec java \
  --add-opens java.base/java.lang=ALL-UNNAMED \
  --add-opens java.base/java.lang.invoke=ALL-UNNAMED \
  --add-opens java.base/java.lang.reflect=ALL-UNNAMED \
  --add-opens java.base/java.io=ALL-UNNAMED \
  --add-opens java.base/java.net=ALL-UNNAMED \
  --add-opens java.base/java.nio=ALL-UNNAMED \
  --add-opens java.base/java.util=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent=ALL-UNNAMED \
  --add-opens java.base/java.util.concurrent.atomic=ALL-UNNAMED \
  --add-opens java.base/sun.nio.ch=ALL-UNNAMED \
  --add-opens java.base/sun.nio.cs=ALL-UNNAMED \
  --add-opens java.base/sun.security.action=ALL-UNNAMED \
  --add-opens java.base/sun.util.calendar=ALL-UNNAMED \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -cp "$SNAP:/opt/spark/jars/*" \
  "$MAIN" "$@"
