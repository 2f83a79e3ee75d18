"""Model zoo: Mamba mixer, prenorm Block, VideoMamba encoder, refiner."""

from videomamba_tpu.models.block import Block, create_block, drop_path
from videomamba_tpu.models.mamba import Mamba
from videomamba_tpu.models.videomamba import (
    PatchEmbed,
    PretrainVideoMamba,
    build_videomamba,
)

__all__ = [
    "Block",
    "Mamba",
    "PatchEmbed",
    "PretrainVideoMamba",
    "build_videomamba",
    "create_block",
    "drop_path",
]
