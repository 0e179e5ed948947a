#!/usr/bin/env bash
# Launch a graft main class (graft.Bench, graft.Verify, ...) on a bare JVM
# with the JDK 17+ module opens Spark/Arrow need (the same list build.sbt
# injects for forked sbt runs). Usage:
#   scripts/run-main.sh graft.Bench [args...]
# Classes are taken from the sbt build output + /opt/spark/jars.
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="${1:?usage: run-main.sh <mainClass> [args...]}"; shift || true
CP="target/scala-2.13/classes:$(ls -d /opt/spark/jars)/*"
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  OPENS="$OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CP" "$MAIN" "$@"
