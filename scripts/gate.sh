#!/usr/bin/env bash
# Emulate the driver's correctness gate end to end: full Verify dump,
# DuckDB compare (oracle_check.py), and the full-suite statement timing
# (oracle_time.py). Run this IDLE before every round end and record the
# final TOTAL line in README — a 36 MB oracle statement shipped in round
# 8 precisely because the timing step was skipped.
#
# Usage: scripts/gate.sh [sfDir] [outDir]
set -euo pipefail
SF="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/gate_out}"
cd "$(dirname "$0")/.."
rm -rf "$OUT"
echo "== Verify dump ($SF -> $OUT)"
SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  sbt -batch "runMain graft.Verify $SF $OUT" > "$OUT.verify.log" 2>&1 \
  || { echo "Verify FAILED:"; tail -20 "$OUT.verify.log"; exit 1; }
grep '\[verify\]' "$OUT.verify.log" || true
echo "== DuckDB compare"
python3 scripts/oracle_check.py "$SF" "$OUT" | tail -3
echo "== Full-suite statement timing (record the TOTAL in README)"
python3 scripts/oracle_time.py "$SF" "$OUT" | tail -6
