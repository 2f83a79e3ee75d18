"""Alias shim (reference parity: video_mamba/videomamba.py)."""

from videomamba_tpu.models.videomamba import (  # noqa: F401
    Block,
    PatchEmbed,
    PretrainVideoMamba,
    build_videomamba,
)
from videomamba_tpu.checkpoint import load_state_dict  # noqa: F401
from videomamba_tpu.models.block import create_block  # noqa: F401
