#!/usr/bin/env bash
# Pre-snapshot gate: the FULL test suite must be green before any
# end-of-round / release commit. Round 4 shipped an untested init-time
# validation in its snapshot commit and broke three of its own tests
# (VERDICT round 4, "What's weak" #1) — this script is the rule that
# prevents a recurrence: run it, read "ALL CHECKS PASSED", then commit.
#
# Usage:
#   scripts/check.sh          # full suite (the gate; ~45 min on 1 core)
#   scripts/check.sh fast     # edit-loop tier only (NOT a valid gate)
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "fast" ]]; then
  python -m pytest tests/ -q -m "not slow"
  echo "FAST TIER PASSED (not a snapshot gate — run scripts/check.sh before committing a snapshot)"
else
  python -m pytest tests/ -q
  python - <<'EOF'
import ast, pathlib
# the driver entry points must at least parse (they import jax lazily)
for f in ("__graft_entry__.py", "bench.py"):
    ast.parse(pathlib.Path(f).read_text())
print("entry points parse")
EOF
  echo "ALL CHECKS PASSED — safe to snapshot"
fi
