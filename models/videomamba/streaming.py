"""Legacy shim (reference parity: models/videomamba/streaming.py)."""

from videomamba_tpu.streaming import (  # noqa: F401
    STREAMING_CONTRACT_VERSION,
    ForwardReturnSemantics,
    LayerState,
    StateShape,
    StreamingState,
    allocate_state,
    expected_state_shapes,
    forward_return_semantics,
    model_forward_return_semantics,
    validate_state,
)
