#!/usr/bin/env bash
# End-of-round snapshot gate — run this BEFORE any snapshot/milestone
# commit that touches src/. Nothing enters a snapshot commit that has
# not just compiled AND passed ManifestSpec (which pins the oracle
# manifest count, queries/oracleSql keyset parity, and EXECUTES every
# registered query at sf0.001 inside sbt test).
#
# This exists because round 14's end-of-round snapshot (42f0df9) did
# not compile — one missing import, added in the final turns without a
# compile — and the driver's entire 142-query correctness artifact for
# the round came back empty. The guard for that failure class
# (ManifestSpec) already existed; it just wasn't run between the last
# edit and the commit. This script makes the ritual one command:
#
#   ./scripts/preflight.sh            # compile + ManifestSpec
#   ./scripts/preflight.sh q142       # ... then spot-check one query
#                                     # end-to-end against DuckDB at
#                                     # sf0.001 (needs graft.Verify)
#
# Exit code 0 = safe to commit.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[preflight] sbt Test/compile + ManifestSpec..."
sbt -batch "Test/compile" "testOnly graft.ManifestSpec"

if [[ $# -ge 1 ]]; then
  only="$1"
  sf="${2:-/root/testdata/sf0.001}"
  out="$(mktemp -d /tmp/graft_preflight.XXXXXX)"
  echo "[preflight] graft.Verify ($only) at $sf -> $out"
  sbt -batch "runMain graft.Verify $sf $out $only"
  echo "[preflight] DuckDB oracle replay..."
  python3 scripts/check_oracle.py "$out" "$sf"
  rm -rf "$out"
fi

echo "[preflight] OK — safe to commit."
