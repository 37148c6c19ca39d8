#!/usr/bin/env bash
# Daemon sustained-ingest load test against the reference's load envelope
# (scripts/generate-stdout.rb 100k msgs; tsung.xml 100 conns/s, 100k cap).
#
# Usage: scripts/loadtest.sh [msgs] [conns] [mode] [trigger_ms] [rate]
#   msgs       total messages        (default 100000)
#   conns      concurrent sockets    (default 100)
#   mode       parquet | kafka       (default parquet)
#   trigger_ms ProcessingTime cadence (default 1000)
#   rate       offered msgs/s across all conns, 0 = unpaced blast
#              (a held rate measures steady-state latency, tsung-style)
#
# Prints one JSON line {"metric":"daemon_ingest",...}. Run EXCLUSIVELY
# (no concurrent sbt/test JVMs) — local[32] contention inflates numbers.
# Results are recorded in BASELINE.md's "daemon envelope" table.
set -euo pipefail
cd "$(dirname "$0")/.."
export GRAFT_LT_MSGS="${1:-100000}"
export GRAFT_LT_CONNS="${2:-100}"
export GRAFT_LT_MODE="${3:-parquet}"
export GRAFT_LT_TRIGGER_MS="${4:-1000}"
export GRAFT_LT_RATE="${5:-0}"
sbt -batch "Test/runMain graft.LoadTest" 2>&1 |
  grep '"metric":"daemon_ingest"'
