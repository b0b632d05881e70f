#!/bin/bash
# Round-close evidence hygiene (rounds 6-8 verdicts): every driver-written
# artifact must be TRACKED AND COMMITTED before the round snapshot, or the
# round's evidence is invisible to the next session.
#
# Usage: tools/round_close.sh [round-number]
# With no args, checks; with a round number, stages + commits the artifacts.
#
# Round-close test gate: the Connect parity sweep samples 1-in-9 by
# default (suite time-box); the FULL 288-query sweep is expected once per
# round via
#   GRAFT_CONNECT_FULL=1 sbt -batch "testOnly graft.ConnectWireSpec"
set -e
cd "$(dirname "$0")/.."

# COPYCHECK.json is intentionally gitignored; everything else the driver
# writes is part of the round's evidence record.
ARTS=$(ls BENCH_r*.json CORRECTNESS_r*.json BASELINE.json \
          LEAKCHECK.json bench_last.json 2>/dev/null || true)

DIRTY=0
for f in $ARTS; do
  if ! git ls-files --error-unmatch "$f" >/dev/null 2>&1; then
    echo "UNTRACKED: $f"; DIRTY=1
  elif ! git diff --quiet HEAD -- "$f" 2>/dev/null; then
    echo "MODIFIED (uncommitted): $f"; DIRTY=1
  fi
done

if [ -n "$(git status --porcelain)" ]; then
  echo "--- git status not clean:"
  git status --short
  DIRTY=1
fi

if [ "$DIRTY" -eq 0 ]; then
  echo "round-close: clean — all artifacts tracked and committed."
  exit 0
fi

if [ -n "$1" ]; then
  git add -A
  git commit -m "round $1: evidence artifacts (bench/correctness/leakcheck)"
  echo "round-close: committed."
else
  echo "round-close: NOT clean. Re-run with a round number to stage+commit."
  exit 1
fi
