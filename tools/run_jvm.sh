#!/usr/bin/env bash
# Run a graft main class directly against the compiled classes + Spark
# jars — no sbt build lock, so long rehearsals can run concurrently with
# interactive sbt work. Compile first (`sbt compile`); this script does
# NOT recompile.
#
# Usage: tools/run_jvm.sh <mainClass> [args...]
# Env:   JVM_MEM (default 8g) → -Xmx
set -euo pipefail
cd "$(dirname "$0")/.."
MAIN="$1"; shift
OPENS=(java.lang java.lang.invoke java.lang.reflect java.io java.net \
       java.nio java.util java.util.concurrent java.util.concurrent.atomic)
FLAGS=()
for p in "${OPENS[@]}"; do FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  FLAGS+=(--add-opens "java.base/$p=ALL-UNNAMED"); done
exec java "${FLAGS[@]}" \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${JVM_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  "$MAIN" "$@"
