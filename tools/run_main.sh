#!/bin/bash
# Launch a graft main directly with java (no sbt lock contention) using the
# compiled classes + the image's Spark jars — same JVM options build.sbt's
# forked run would inject. Usage: tools/run_main.sh graft.Bench [args...]
# Env knobs pass through (SPARK_GRAFT_*, SPARK_DRIVER_MEM).
set -euo pipefail
REPO="$(cd "$(dirname "$0")/.." && pwd)"
CLASSES="$REPO/target/scala-2.13/classes"
[ -d "$CLASSES" ] || { echo "compile first: sbt compile" >&2; exit 1; }
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -XX:ReservedCodeCacheSize=512m \
  ${SPARK_GRAFT_JVM_OPTS:-} \
  -cp "$CLASSES:/opt/spark/jars/*" "$@"
