#!/bin/bash
# Run a graft main from a class dir without sbt (lock-free, so sbt can
# keep compiling while a long run proceeds from a SNAPSHOT of target/).
# Usage: tools/run_java.sh [-cp <classdir>] <MainClass> [args...]
# Env: JAVA_XMX (default 8g), SPARK_GRAFT_* knobs pass through,
# JAVA_EXTRA_OPTS appends raw JVM flags (e.g. the r14 code-cache A/B:
# JAVA_EXTRA_OPTS="-XX:+SegmentedCodeCache").
set -euo pipefail
CP="target/scala-2.13/classes"
if [ "${1:-}" = "-cp" ]; then CP="$2"; shift 2; fi
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens=java.base/$p=ALL-UNNAMED"
done
exec java -cp "$CP:/opt/spark/jars/*" $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${JAVA_XMX:-8g}" \
  -Dspark.sql.codegen.cache.maxEntries=5000 -XX:ReservedCodeCacheSize=2g \
  ${JAVA_EXTRA_OPTS:-} \
  "$@"
