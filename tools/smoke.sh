#!/usr/bin/env bash
# Environment canary — run at session start and before every round-end
# commit. Five queries, one per entry path, two touching events: catches
# the r5 class of break (driver-regenerated testdata changing a physical
# schema) that per-family unit tests never exercise.
#
#   tpch_q6         parquet scan + pushdown (lineitem)
#   sql_expressions SQL-text path → Engine.registerAll (all 10 views,
#                   dies at registration if ANY table fails to read)
#   stream_tumbling Structured Streaming over events
#   click_count     events via the DataFrame path
#   pipe_dedup_exact documents / pipeline tier
#   tpcds_q96       TPC-DS child-session path (generates target/tpcds on
#                   first run; catches generator/catalog regressions)
#
# Usage: tools/smoke.sh [sfDir]   (default /root/testdata/sf0.001)
# Exit non-zero if any query fails to produce output.
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/root/testdata/sf0.001}"
OUT="$(mktemp -d /tmp/graft_smoke.XXXXXX)"
trap 'rm -rf "$OUT"' EXIT
QUERIES=(tpch_q6 sql_expressions stream_tumbling click_count pipe_dedup_exact tpcds_q96)
SPARK_GRAFT_ONLY="$(IFS=,; echo "${QUERIES[*]}")" \
  sbt -batch "runMain graft.Verify $SF $OUT" >/dev/null 2>"$OUT/err.log" || {
    echo "SMOKE: Verify crashed; tail of stderr:"; tail -20 "$OUT/err.log"; exit 1; }
rc=0
for q in "${QUERIES[@]}"; do
  if ls "$OUT/$q"/*.parquet >/dev/null 2>&1 || ls "$OUT/$q"/part-* >/dev/null 2>&1; then
    echo "SMOKE PASS $q"
  else
    echo "SMOKE FAIL $q (no output; grep '\[verify\] $q' below)"
    grep "\[verify\] $q" "$OUT/err.log" || true
    rc=1
  fi
done
exit $rc
