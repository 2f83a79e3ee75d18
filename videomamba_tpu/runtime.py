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


class DecodeSession:
    """Token-level decode: ONE compiled step for the whole layer stack.

    The reference decodes token-by-token through a Python loop over layers
    with an in-place cache (mamba_simple.py:316-330,453-497). Here the
    per-layer parameters and states are stacked on a leading depth axis and
    a single jit-compiled ``lax.scan`` over layers advances all of them —
    one program, no per-layer dispatch, state donated between steps.

    Works on token embeddings (B, d_model): embed video patches upstream
    (e.g. via a streaming prefill) and feed tokens one at a time.
    """

    def __init__(self, model, batch_size: int, dtype: Optional[jnp.dtype] = None):
        self.model = model
        self.batch_size = batch_size
        block = model.layers[0]
        self.mixer = block.mixer
        self.norm_type = block.norm_type
        self.eps = block.norm_epsilon
        self.residual_in_fp32 = block.residual_in_fp32

        self.stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *model.params["layers"]
        )
        conv, ssm = model.layers[0].mixer.allocate_state(batch_size, dtype=dtype)
        depth = model.depth
        self.conv_states = jnp.broadcast_to(conv, (depth,) + conv.shape)
        self.ssm_states = jnp.broadcast_to(ssm, (depth,) + ssm.shape)
        self._step = self._build_step()

    def _build_step(self):
        mixer = self.mixer
        model = self.model
        norm_type = self.norm_type
        eps = self.eps
        rif32 = self.residual_in_fp32

        from videomamba_tpu.ops.norm import fused_add_norm

        def step(params, stacked, conv_states, ssm_states, token):
            # token: (B, d_model) current-token embedding (pos already added)
            def layer_step(carry, xs):
                hidden, residual = carry
                lp, cs, ss = xs
                normed, residual = fused_add_norm(
                    hidden, lp["norm"]["weight"], lp["norm"].get("bias"),
                    residual=residual, prenorm=True,
                    residual_in_fp32=rif32, eps=eps, norm_type=norm_type,
                )
                out, cs, ss = mixer.step(lp["mixer"], normed, cs, ss)
                return (out, residual), (cs, ss)

            hidden = token[:, None, :]
            # A zero initial residual is identical to the reference's None
            # (residual_out = hidden) and keeps the scan carry structure
            # fixed; dtype follows the residual_in_fp32 policy.
            res0 = jnp.zeros_like(
                hidden, dtype=jnp.float32 if rif32 else hidden.dtype
            )
            (hidden, residual), (new_conv, new_ssm) = jax.lax.scan(
                layer_step, (hidden, res0), (stacked, conv_states, ssm_states)
            )
            feat = fused_add_norm(
                hidden, params["norm"]["weight"], params["norm"].get("bias"),
                residual=residual, prenorm=False,
                residual_in_fp32=rif32, eps=eps, norm_type=norm_type,
            )
            return feat[:, 0], new_conv, new_ssm

        return jax.jit(step, donate_argnums=(2, 3))

    def step(self, token: Array) -> Array:
        """Advance one token; returns (B, d_model) final-norm features."""
        feat, self.conv_states, self.ssm_states = self._step(
            self.model.params, self.stacked, self.conv_states,
            self.ssm_states, token,
        )
        return feat

    def load_streaming_state(self, state) -> None:
        """Adopt a streaming-contract state (e.g. after a chunked prefill)."""
        convs = jnp.stack([jnp.asarray(s[0]) for s in
                           (state.values() if isinstance(state, dict) else state)])
        ssms = jnp.stack([jnp.asarray(s[1]) for s in
                          (state.values() if isinstance(state, dict) else state)])
        self.conv_states = convs.astype(self.conv_states.dtype)
        self.ssm_states = ssms.astype(self.ssm_states.dtype)


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
