#!/usr/bin/env bash
# CPU CI lane, executable locally: the same steps the cpu-matrix workflow
# job runs (minus the pip-install matrix — this environment has no network
# egress, so the lane runs against the environment-provided jax/flax/torch
# versions, recorded in the output). Appends a dated record to CI_RUNS.md
# when invoked with --record.
set -euo pipefail
cd "$(dirname "$0")/.."

RECORD=0
if [[ "${1:-}" == "--record" ]]; then
  RECORD=1
fi

VERSIONS=$(python - <<'EOF'
import jax, jaxlib, flax, optax, numpy, torch
print(f"jax={jax.__version__} jaxlib={jaxlib.__version__} "
      f"flax={flax.__version__} optax={optax.__version__} "
      f"numpy={numpy.__version__} torch={torch.__version__}")
EOF
)
echo "lane versions: $VERSIONS"

# 1. Streaming parity smoke (same flags as the workflow step).
JAX_PLATFORMS=cpu python scripts/check_streaming_state.py --seed 7 \
  --deterministic --deterministic-warn-only --cudnn-benchmark off \
  --allow-tf32 off

# 2. Fast tier.
START=$(date +%s)
python -m pytest tests/ -m "not slow" -q
FAST_SECS=$(( $(date +%s) - START ))

# 3. Full suite (the latest-lane / nightly step).
START=$(date +%s)
python -m pytest tests/ -q
FULL_SECS=$(( $(date +%s) - START ))

if [[ "$RECORD" == 1 ]]; then
  {
    echo ""
    echo "## $(date -u +%Y-%m-%dT%H:%M:%SZ) — cpu-matrix lane (local)"
    echo '```'
    echo "$VERSIONS"
    echo "parity smoke: green"
    echo "fast tier: green (${FAST_SECS}s)"
    echo "full suite: green (${FULL_SECS}s)"
    echo '```'
  } >> CI_RUNS.md
  echo "recorded to CI_RUNS.md"
fi
echo "CPU lane green"
