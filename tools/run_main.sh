#!/usr/bin/env bash
# Launch a graft harness main via plain java (dev/driver-side tooling):
# no sbt project lock, no sbt startup latency — so long soaks can run
# while sbt compiles/tests continue in the repo. Mirrors build.sbt's
# forked-run JVM options (JDK-17 add-opens + UTC + no UI).
#
# Usage: tools/run_main.sh <MainClass> [args...]
# Env: GRAFT_JAR (default: the sbt-packaged jar), SPARK_DRIVER_MEM (8g),
#      plus the usual SPARK_GRAFT_* knobs read by GraftSession.
set -eu
JAR=${GRAFT_JAR:-/root/repo/target/scala-2.13/adbsouthcaucasusetlspark_2.13-0.1.0.jar}
FLAGS=""
for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  FLAGS="$FLAGS --add-opens=$p=ALL-UNNAMED"
done
# shellcheck disable=SC2086
exec java $FLAGS -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -cp "$JAR:/opt/spark/jars/*" "$@"
