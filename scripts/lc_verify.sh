#!/usr/bin/env bash
# Multi-JVM correctness gate (r13 verdict item 1): the full oracle surface
# under --master local-cluster[2,8,8192] — TWO separate executor JVMs, so
# closure serialization, state-store placement, shuffle and codegen all
# cross real process boundaries instead of sharing the driver's heap as
# local[32] does. Everything else matches the driver's Verify contract;
# check.py compares against the DuckDB oracle exactly as the round gate
# does.
#
#   scripts/lc_verify.sh [sf0.01] [outdir] [key1,key2,...]
#
# Requires `sbt -batch package` first (the executor JVMs need the app
# JAR — sbt's classes directory never leaves the driver).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-sf0.01}"
OUT="${2:-/tmp/vout_lc}"
KEYS="${3:-}"
JAR=$(ls -t target/scala-2.13/*.jar 2>/dev/null | head -1)
if [ -z "$JAR" ]; then echo "run: sbt -batch package" >&2; exit 2; fi
export SPARK_HOME=/opt/spark
# Verify honors SPARK_GRAFT_MASTER over its local[$cpus] default — the
# builder's master() would otherwise override spark-submit's --master
export SPARK_GRAFT_MASTER="local-cluster[2,8,8192]"
ARGS=("/root/testdata/$SF" "$OUT")
if [ -n "$KEYS" ]; then ARGS+=("$KEYS"); fi
/opt/spark/bin/spark-submit \
  --master "local-cluster[2,8,8192]" \
  --driver-memory 8g \
  --conf spark.sql.shuffle.partitions=16 \
  --conf spark.sql.session.timeZone=UTC \
  --conf spark.sql.legacy.parquet.nanosAsLong=true \
  --conf spark.sql.extensions=graft.GraftExtensions \
  --conf spark.ui.enabled=false \
  --class graft.Verify "$JAR" "${ARGS[@]}"
python3 scripts/check.py "/root/testdata/$SF" "$OUT"
