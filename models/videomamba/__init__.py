"""Legacy import root (reference parity: models/videomamba/__init__.py)."""

from videomamba_tpu.models.block import Block, create_block  # noqa: F401
from videomamba_tpu.models.mamba import Mamba  # noqa: F401
from videomamba_tpu.models.videomamba import (  # noqa: F401
    PatchEmbed,
    PretrainVideoMamba,
    build_videomamba,
)
from videomamba_tpu.checkpoint import load_state_dict  # noqa: F401
from videomamba_tpu.streaming import (  # noqa: F401
    STREAMING_CONTRACT_VERSION,
    ForwardReturnSemantics,
    StateShape,
    StreamingState,
    allocate_state,
    expected_state_shapes,
    forward_return_semantics,
    model_forward_return_semantics,
    validate_state,
)
