#!/bin/bash
# Run a compiled graft main without sbt (avoids sbt target/ lock contention
# when a long background run overlaps interactive compiles). Mirrors the
# javaOptions in build.sbt (JDK17 add-opens + UTC + no UI).
# Usage: tools/run_main.sh <mainClass> [args...]
set -euo pipefail
CLASS="$1"; shift
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-32g}" \
  -cp "/root/repo/target/scala-2.13/classes:/opt/spark/jars/*" \
  "$CLASS" "$@"
