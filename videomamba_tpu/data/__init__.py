"""Data-side helpers: mask generation and streaming chunk iteration."""

from videomamba_tpu.data.masking import RandomMaskingGenerator, TubeMaskingGenerator
from videomamba_tpu.data.video import chunk_video, iter_video_chunks

__all__ = [
    "RandomMaskingGenerator",
    "TubeMaskingGenerator",
    "chunk_video",
    "iter_video_chunks",
]
