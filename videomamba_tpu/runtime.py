"""Streaming serving runtime: stateful session over the jit-stable chunk path.

The reference documents chunked streaming as a calling convention
(README.md:92-127); here it is packaged as a runtime object optimized for
TPU serving: one compiled chunk program reused for every continuation chunk
(fixed shapes, fixed state pytree), offset bookkeeping in host code, and
multi-stream batching (each batch row is an independent video stream).
"""

from __future__ import annotations

import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


class StreamingSession:
    """Carries per-layer (conv_state, ssm_state) across chunk calls.

    Example:
        session = StreamingSession(model, batch_size=4)
        for chunk in video_chunks:         # (B, C, Tc, H, W) each
            x_vis, x_pool = session.process(chunk)

    Each batch row is an independent stream; reset selected rows with
    :meth:`reset` (zeroing their state) when a stream ends.
    """

    def __init__(
        self,
        model,
        batch_size: int,
        dtype: Optional[jnp.dtype] = None,
        device: Optional[jax.Device] = None,
    ):
        self.model = model
        self.batch_size = batch_size
        self.state = model.allocate_state(batch_size, dtype=dtype, device=device)
        self.offset = 0  # temporal tokens (post-tubelet)

    def process(self, chunk: Array, mask=None, keep_temporal: bool = False):
        """Run one chunk; returns per the model's forward-return contract
        minus the state (which the session keeps)."""
        out = self.model(
            chunk,
            mask=mask,
            keep_temporal=keep_temporal,
            ssm_state=self.state,
            temporal_pos_offset=self.offset,
        )
        *outputs, self.state = out
        self.offset += chunk.shape[2] // self.model.patch_embed.tubelet_size
        return tuple(outputs) if len(outputs) > 1 else outputs[0]

    def reset(self, rows: Optional[List[int]] = None) -> None:
        """Zero the carried state (all rows, or the given batch rows)."""
        if rows is None:
            self.state = self.model.allocate_state(
                self.batch_size,
                dtype=self.state[0][0].dtype if self.state else None,
            )
            self.offset = 0
            return
        idx = jnp.asarray(rows)

        def zero_rows(s):
            return s.at[idx].set(0)

        self.state = jax.tree_util.tree_map(zero_rows, self.state)

    def block_until_ready(self) -> None:
        jax.tree_util.tree_map(lambda s: s.block_until_ready(), self.state)


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> Tuple[float, List[float]]:
    """(median_seconds, all_times) for fn(*args) with device sync per call."""
    for _ in range(warmup):
        out = fn(*args)
        jax.block_until_ready(out)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times_sorted = sorted(times)
    return times_sorted[len(times_sorted) // 2], times
