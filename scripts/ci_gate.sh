#!/usr/bin/env bash
# One-command quality gate (VERDICT r4 "Next #8"): fast tests + the
# synthetic registration-quality gates at their asserted bands.
#
# Run AFTER any perf/kernel change; a green run is the "gates unchanged"
# claim for that commit.  TPU required for the synthetic_eval gates
# (they measure the shipped TPU kernel stack); the pytest tier runs on
# the virtual CPU mesh regardless.
#
# Usage: scripts/ci_gate.sh [quick]
#   quick: 30/20/20 pairs (~8 min warm) instead of the full 100/50/50.
set -euo pipefail
cd "$(dirname "$0")/.."

PAIRS=100; LOW=50; KPAIRS=50
if [[ "${1:-}" == "quick" ]]; then PAIRS=30; LOW=20; KPAIRS=20; fi

echo "=== 1/3 fast pytest tier (virtual CPU mesh) ==="
python -m pytest tests/ -x -q

echo "=== 2/3 3DMatch synthetic gates (${PAIRS}/${LOW} pairs) ==="
python scripts/synthetic_eval.py --pairs "$PAIRS" --low-pairs "$LOW" \
    --json /tmp/ci_quality.json --assert-recall 0.9 --assert-low-recall 0.45

echo "=== 3/3 KITTI synthetic gate (${KPAIRS} pairs) ==="
python scripts/synthetic_eval.py --config KITTI --pairs "$KPAIRS" \
    --json /tmp/ci_quality.json --assert-recall 0.9

echo "CI GATE GREEN"
