"""Streaming chunk iteration over video arrays.

Host-side utilities that feed the streaming runtime: slice a long video
[B, C, T, H, W] into fixed-size temporal chunks aligned to the tubelet size
(the contract requirement), yielding (chunk, temporal_pos_offset) pairs that
plug directly into ``model(chunk, ssm_state=state, temporal_pos_offset=o)``
or ``StreamingSession.process``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np


def chunk_video(total_frames: int, chunk_frames: int, tubelet_size: int = 1):
    """Yield (start_frame, end_frame, temporal_pos_offset) triples.

    The final chunk is truncated to the remaining frames, rounded DOWN to a
    multiple of the tubelet size (frames that cannot form a full tubelet are
    dropped, matching the model's divisibility requirement).
    """
    if chunk_frames % tubelet_size != 0:
        raise ValueError(
            f"chunk_frames ({chunk_frames}) must be divisible by "
            f"tubelet_size ({tubelet_size})."
        )
    start = 0
    while start < total_frames:
        end = min(start + chunk_frames, total_frames)
        usable = ((end - start) // tubelet_size) * tubelet_size
        if usable == 0:
            return
        end = start + usable
        yield start, end, start // tubelet_size
        start = end


def iter_video_chunks(
    video: np.ndarray, chunk_frames: int, tubelet_size: int = 1
) -> Iterator[Tuple[np.ndarray, int]]:
    """Iterate (chunk [B, C, Tc, H, W], temporal_pos_offset) over a video."""
    if video.ndim != 5:
        raise ValueError("video must have shape [B, C, T, H, W].")
    total = video.shape[2]
    for start, end, offset in chunk_video(total, chunk_frames, tubelet_size):
        yield video[:, :, start:end], offset
