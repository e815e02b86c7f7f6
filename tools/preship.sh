#!/usr/bin/env bash
# Pre-ship gate — the round-15 lesson made mechanical (VERDICT r15 #6:
# a plan-shape change landed in the final commits without re-running
# the suite, and the forced-broadcast guard was red at judging time).
#
# Run before ANY end-of-round snapshot, and after ANY commit touching
# src/main that alters a plan shape (join hints, exchanges, physical
# operators, new registry queries):
#
#   tools/preship.sh          # plan guard + full suite
#   tools/preship.sh --fast   # plan guard only (SinkAndPlanSpec), ~3 min
#
# Exit nonzero on any failure; prints a one-line PASS/FAIL verdict.
set -u
cd "$(dirname "$0")/.."

FAST=0
[ "${1:-}" = "--fast" ] && FAST=1

if [ "$FAST" = 1 ]; then
  sbt -batch "testOnly graft.SinkAndPlanSpec" > /tmp/preship.log 2>&1
else
  sbt -batch test > /tmp/preship.log 2>&1
fi
rc=$?

tail -20 /tmp/preship.log | grep -E "Tests:|All tests passed|Failed:|\*\*\* " || true
if [ $rc -ne 0 ]; then
  echo "PRESHIP FAIL (exit $rc) — full log: /tmp/preship.log"
  exit $rc
fi
echo "PRESHIP PASS ($([ "$FAST" = 1 ] && echo plan-guard-only || echo full suite))"
