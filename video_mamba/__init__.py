"""Stable import alias — drop-in for the reference ``video_mamba`` root.

Re-exports the same public names as the reference
(/root/reference/video_mamba/__init__.py:1-42) from the TPU-native
implementation. ``video_mamba.X is models.videomamba.X`` identity holds, as
in the reference (tested).
"""

from videomamba_tpu.determinism import (
    DeterminismConfig,
    add_determinism_args,
    configure_determinism,
    configure_determinism_from_args,
)
from videomamba_tpu.models.refiner import BiMambaRefinerBlock
from videomamba_tpu.models.videomamba import PretrainVideoMamba, build_videomamba
from videomamba_tpu.streaming import (
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

__all__ = [
    "DeterminismConfig",
    "ForwardReturnSemantics",
    "LayerState",
    "BiMambaRefinerBlock",
    "PretrainVideoMamba",
    "STREAMING_CONTRACT_VERSION",
    "StateShape",
    "StreamingState",
    "add_determinism_args",
    "allocate_state",
    "build_videomamba",
    "configure_determinism",
    "configure_determinism_from_args",
    "expected_state_shapes",
    "forward_return_semantics",
    "model_forward_return_semantics",
    "validate_state",
]
