#!/usr/bin/env bash
# TPU CI lane: the steps the self-hosted tpu job runs, executable locally on
# any machine with one TPU chip. Appends a dated record to CI_RUNS.md when
# invoked with --record.
set -euo pipefail
cd "$(dirname "$0")/.."

RECORD=0
if [[ "${1:-}" == "--record" ]]; then
  RECORD=1
fi

run() {
  echo "== $*"
  "$@"
}

# 1. Bench smoke on the real chip (prints one JSON line).
BENCH_JSON=$(python bench.py --quick)
echo "$BENCH_JSON"

# 2. Contract subset on the chip (the reference CI's
#    minimal_cuda_streaming_forward_contract equivalent). The suite's
#    conftest pins pytest to CPU, so drive the contract directly.
python - <<'EOF'
import jax, jax.numpy as jnp
import numpy as np
from videomamba_tpu.models.presets import videomamba_tiny
from video_mamba import allocate_state, validate_state, expected_state_shapes

model = videomamba_tiny(num_frames=8, add_pool_norm=False, rng=0)
x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 8, 224, 224), jnp.float32)
full = model(x)
state = allocate_state(model, 1)
validate_state(model, state, batch_size=1)
assert len(expected_state_shapes(model, 1)) == model.depth
c1, state = model(x[:, :, :4], ssm_state=state, temporal_pos_offset=0)
c2, _ = model(x[:, :, 4:], ssm_state=state, temporal_pos_offset=4)
stitched = jnp.concatenate([c1, c2], axis=1)
rel = float(jnp.max(jnp.abs(stitched - full)) / jnp.max(jnp.abs(full)))
assert rel < 1e-3, rel
print(f"TPU streaming contract OK (rel err {rel:.2e}, backend "
      f"{jax.devices()[0].platform})")
EOF

if [[ "$RECORD" == 1 ]]; then
  {
    echo ""
    echo "## $(date -u +%Y-%m-%dT%H:%M:%SZ) — $(python -c 'import jax; print(jax.devices()[0].device_kind)')"
    echo '```'
    echo "$BENCH_JSON"
    echo "contract: green"
    echo '```'
  } >> CI_RUNS.md
  echo "recorded to CI_RUNS.md"
fi
echo "TPU lane green"
