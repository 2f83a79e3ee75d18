"""Data-side helpers: mask generation, streaming chunk iteration, datasets."""

from videomamba_tpu.data.dataset import (
    load_file_list,
    make_clip_loader,
    scan_class_directories,
)
from videomamba_tpu.data.masking import RandomMaskingGenerator, TubeMaskingGenerator
from videomamba_tpu.data.video import chunk_video, iter_video_chunks

__all__ = [
    "RandomMaskingGenerator",
    "TubeMaskingGenerator",
    "chunk_video",
    "iter_video_chunks",
    "load_file_list",
    "make_clip_loader",
    "scan_class_directories",
]
