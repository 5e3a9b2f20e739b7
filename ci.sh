#!/usr/bin/env bash
# CI entry point (SURVEY.md §5 row 2: sanitizer-analog + determinism job).
#
# Tiers:
#   ./ci.sh          fast: unit tests (-m "not slow") + NaN-debug smoke +
#                    rerun-determinism check (~4 min, CPU only)
#   ./ci.sh full     adds the slow pytest tier (full SD runs, mesh/multihost
#                    parity, suite-scale instances; ~25 min CPU)
set -euo pipefail
cd "$(dirname "$0")"

echo "== [1/3] fast pytest tier =="
python -m pytest tests/ -q -m "not slow"

echo "== [2/3] NaN-debug smoke + rerun determinism (scripts/ci_checks.py) =="
python scripts/ci_checks.py

if [[ "${1:-}" == "full" ]]; then
  echo "== [3/3] slow pytest tier =="
  python -m pytest tests/ -q -m slow
else
  echo "== [3/3] slow tier skipped (run './ci.sh full' to include) =="
fi

echo "CI OK"
