#!/usr/bin/env bash
# Full local gate: compile, unit tests, correctness dump + DuckDB oracle
# compare at the given scale factor (default sf0.001 for speed; the driver
# gate runs sf0.01).
set -euo pipefail
cd "$(dirname "$0")/.."
SF="${1:-sf0.001}"
OUT="$(mktemp -d /tmp/graft-verify-XXXX)"
sbt -batch test
sbt -batch "runMain graft.tools.PlanAudit /root/testdata/sf0.001 PLANAUDIT.md"
sbt -batch "runMain graft.Verify /root/testdata/$SF $OUT"
python3 scripts/check.py "/root/testdata/$SF" "$OUT"
