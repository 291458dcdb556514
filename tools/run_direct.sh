#!/bin/bash
# Direct-JVM launcher for the graft mains (bypasses the sbt project
# lock so long sweeps don't serialize against compile/test work).
# Usage: tools/run_direct.sh <MainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 8g), SPARK_GRAFT_CPUS etc. pass through.
set -e
cd "$(dirname "$0")/.."
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  "$@"
