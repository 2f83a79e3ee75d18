"""Legacy shim (reference parity: models/videomamba/videomamba.py)."""

from videomamba_tpu.checkpoint import load_state_dict  # noqa: F401
from videomamba_tpu.models.block import Block, create_block  # noqa: F401
from videomamba_tpu.models.videomamba import (  # noqa: F401
    PatchEmbed,
    PretrainVideoMamba,
    build_videomamba,
)
