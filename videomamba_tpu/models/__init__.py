"""Model zoo: Mamba mixer, prenorm Block, VideoMamba encoder, refiner."""

from videomamba_tpu.models.block import Block, create_block, drop_path
from videomamba_tpu.models.mamba import Mamba
from videomamba_tpu.models.mamba2 import Mamba2
from videomamba_tpu.models.videomamba import (
    PatchEmbed,
    PretrainVideoMamba,
    build_videomamba,
)

__all__ = [
    "Block",
    "Mamba",
    "Mamba2",
    "PatchEmbed",
    "PretrainVideoMamba",
    "build_videomamba",
    "create_block",
    "drop_path",
]
