#!/usr/bin/env bash
# Double-pass drift net — re-run robustness audit for the verify gate.
#
# Runs graft.Verify TWICE in sequential JVMs WITHOUT clearing the
# LakeTable warehouses between passes (java.io.tmpdir/graft_warehouse_*
# persists), then oracle-checks both outputs. Pass 2 therefore executes
# every store lifecycle on top of pass 1's table state — replaced tables
# with prior version history, existing branches/tags, promoted schemas —
# which is exactly the state a driver harness that re-runs (retries,
# smoke-then-gate) would see. A query whose second pass diverges is a
# re-run robustness bug even if a single pass is green.
#
# Usage: scripts/double_pass.sh [sfDir] [queryPrefixes]
#   scripts/double_pass.sh                          # full surface, sf0.01
#   scripts/double_pass.sh /root/testdata/sf0.01 c  # store series only
set -u
SF=${1:-/root/testdata/sf0.01}
PREFIX=${2:-}
OUT1=/tmp/double_pass_1
OUT2=/tmp/double_pass_2
rm -rf "$OUT1" "$OUT2"

run() { # pass number, out dir
  # sbt's own exit status first: a compile failure or JVM crash has no
  # '[verify]...failed' line, and swallowing it here surfaced later as
  # a confusing check_oracle traceback on the missing oracle_sql.json
  if [ -n "$PREFIX" ]; then
    sbt -batch "runMain graft.Verify $SF $2 $PREFIX" >"/tmp/double_pass_$1.log" 2>&1 || return 1
  else
    sbt -batch "runMain graft.Verify $SF $2" >"/tmp/double_pass_$1.log" 2>&1 || return 1
  fi
  grep -i "\[verify\].*failed" "/tmp/double_pass_$1.log" && return 1
  return 0
}

rc=0
for i in 1 2; do
  out=$([ "$i" = 1 ] && echo "$OUT1" || echo "$OUT2")
  echo "=== pass $i ==="
  run "$i" "$out" || { echo "pass $i: Verify reported query failures"; rc=1; }
  python3 "$(dirname "$0")/check_oracle.py" "$SF" "$out" \
    >"/tmp/double_pass_${i}_oracle.log" 2>&1 || rc=1
  grep -v "^OK " "/tmp/double_pass_${i}_oracle.log" | tail -5
done
[ "$rc" = 0 ] && echo "DOUBLE PASS: both passes green" || echo "DOUBLE PASS: DIVERGENCE (see /tmp/double_pass_*.log)"
exit $rc
