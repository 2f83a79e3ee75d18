#!/usr/bin/env bash
# Mechanical round-end evidence loop (round-4 verdict item 7).
#
# Runs, in order: COVERAGE.md test-count regeneration, the full CPU suite,
# and the TPU lane (bench smoke + on-chip streaming contract), then appends
# one dated record to CI_RUNS.md naming the exact source commit the evidence
# was produced from. Convention: run this AFTER the round's last source
# commit, then make the final commit contain ONLY the evidence files
# (CI_RUNS.md, COVERAGE.md, BENCH/ROADMAP updates) so the recorded
# source-commit == the round's source HEAD.
#
# Usage: scripts/close_round.sh [--skip-tpu]
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_TPU=0
if [[ "${1:-}" == "--skip-tpu" ]]; then
  SKIP_TPU=1
fi

COMMIT=$(git rev-parse --short HEAD)
DIRTY=""
if ! git diff --quiet -- . ':!CI_RUNS.md' ':!COVERAGE.md' ':!ROADMAP.md'; then
  DIRTY=" (+uncommitted source changes — evidence is NOT at a clean commit)"
fi

echo "== close_round: evidence for commit ${COMMIT}${DIRTY}"

echo "== 1/3 coverage count"
python scripts/update_coverage_count.py

echo "== 2/3 full CPU suite"
FULL_START=$(date +%s)
python -m pytest tests/ -q -p no:cacheprovider 2>&1 | tail -2 | tee /tmp/close_round_full.txt
FULL_SECS=$(( $(date +%s) - FULL_START ))
FULL_LINE=$(grep -Eo '[0-9]+ passed[^(]*' /tmp/close_round_full.txt | head -1)
if ! grep -q " passed" /tmp/close_round_full.txt || grep -q " failed" /tmp/close_round_full.txt; then
  echo "close_round: full suite NOT green — refusing to record" >&2
  exit 1
fi

TPU_LINE="skipped (--skip-tpu)"
if [[ "$SKIP_TPU" == 0 ]]; then
  echo "== 3/3 TPU lane (records its own bench JSON)"
  bash scripts/ci_tpu_lane.sh --record
  TPU_LINE="green (see TPU record above this entry)"
fi

{
  echo ""
  echo "## $(date -u +%Y-%m-%dT%H:%M:%SZ) — round close @ ${COMMIT}${DIRTY}"
  echo '```'
  python - <<'EOF'
import importlib.metadata as md
print(" ".join(f"{p}={md.version(p)}" for p in ("jax", "jaxlib", "flax", "optax", "numpy")))
EOF
  echo "full suite: ${FULL_LINE:-green} (${FULL_SECS}s, CPU 8-dev virtual mesh)"
  echo "coverage count: $(grep -Eo '[0-9]+ tests, .pytest' COVERAGE.md | head -1 | cut -d' ' -f1) (regenerated)"
  echo "tpu lane: ${TPU_LINE}"
  echo '```'
} >> CI_RUNS.md
echo "== close_round: recorded to CI_RUNS.md for ${COMMIT}"
