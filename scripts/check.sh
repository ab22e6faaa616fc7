#!/usr/bin/env bash
# Local end-to-end correctness gate: Verify dump at sf0.01 + DuckDB compare.
set -euo pipefail
cd "$(dirname "$0")/.."
SF_DIR="${1:-/root/testdata/sf0.01}"
OUT="${2:-/tmp/verify_out}"
rm -rf "$OUT"
sbt -batch "runMain graft.Verify $SF_DIR $OUT" 2>&1 | grep -Ev '^\[info\]|^\[success\]|WARN' || true
python3 scripts/compare.py "$SF_DIR" "$OUT"
