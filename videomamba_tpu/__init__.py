"""videomamba_tpu — TPU-native VideoMamba framework (JAX/XLA/Pallas).

Brand-new implementation of the tannerhoalst/VideoMamba capability surface,
designed TPU-first: Pallas kernels for the selective scan / causal conv /
fused add-norm, XLA for everything else, functional streaming state threaded
through jit, and jax.sharding-based distribution.

Stable public API (superset of the reference ``video_mamba`` root,
/root/reference/video_mamba/__init__.py):
"""

from videomamba_tpu.determinism import (
    DeterminismConfig,
    add_determinism_args,
    configure_determinism,
    configure_determinism_from_args,
    get_rng_key,
    next_rng_key,
)
from videomamba_tpu.models.block import Block, create_block
from videomamba_tpu.models.mamba import Mamba
from videomamba_tpu.models.mamba2 import Mamba2
from videomamba_tpu.models.presets import (
    videomamba_base,
    videomamba_base_m2,
    videomamba_middle,
    videomamba_middle_m2,
    videomamba_small,
    videomamba_small_m2,
    videomamba_tiny,
    videomamba_tiny_m2,
)
from videomamba_tpu.models.mamba import InferenceCache
from videomamba_tpu.models.refiner import BiMambaRefinerBlock
from videomamba_tpu.models.videomamba import (
    PatchEmbed,
    PretrainVideoMamba,
    build_videomamba,
)
from videomamba_tpu.runtime import DecodeSession, StreamingSession
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

__version__ = "0.1.0"

__all__ = [
    "BiMambaRefinerBlock",
    "Block",
    "DecodeSession",
    "DeterminismConfig",
    "ForwardReturnSemantics",
    "InferenceCache",
    "LayerState",
    "Mamba",
    "Mamba2",
    "StreamingSession",
    "PatchEmbed",
    "PretrainVideoMamba",
    "STREAMING_CONTRACT_VERSION",
    "StateShape",
    "StreamingState",
    "add_determinism_args",
    "allocate_state",
    "build_videomamba",
    "configure_determinism",
    "configure_determinism_from_args",
    "create_block",
    "expected_state_shapes",
    "forward_return_semantics",
    "get_rng_key",
    "model_forward_return_semantics",
    "next_rng_key",
    "validate_state",
    "videomamba_base",
    "videomamba_base_m2",
    "videomamba_middle",
    "videomamba_middle_m2",
    "videomamba_small",
    "videomamba_small_m2",
    "videomamba_tiny",
    "videomamba_tiny_m2",
]
