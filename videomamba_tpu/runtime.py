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

    def __init__(self, model, batch_size: int, dtype: Optional[jnp.dtype] = None,
                 use_pallas: Optional[bool] = None):
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
        self.backend = "pallas" if self._pallas_ok(use_pallas) else "xla"
        if self.backend == "pallas":
            # Kernel layouts: states with the channel axis in lanes
            # (K, B, W, C) / (K, B, N, Di); weight packs precomputed once.
            self.conv_states = self.conv_states.swapaxes(2, 3)
            if hasattr(self.mixer, "dt_rank_"):
                self.ssm_states = self.ssm_states.swapaxes(2, 3)
                self._packs = self._build_packs()
                self._step = self._build_step_pallas()
            else:
                # SSD state (K, B, H, P, N) -> (K, B, N, H*P) lanes.
                k, b, h, p, n = self.ssm_states.shape
                self.ssm_states = self.ssm_states.reshape(
                    k, b, h * p, n).swapaxes(2, 3)
                self._packs = self._build_packs_m2()
                self._step = self._build_step_pallas_m2()
        else:
            self._step = self._build_step()

    def _pallas_ok(self, use_pallas: Optional[bool]) -> bool:
        """Whole-stack decode kernel eligibility (auto unless forced)."""
        from videomamba_tpu.ops import dispatch

        if use_pallas is False:
            return False
        runnable = dispatch.on_tpu() or dispatch.interpret_mode()
        mixer = self.mixer
        lp0 = self.stacked["mixer"]
        compatible = (
            "bias" not in lp0["in_proj"]
            and "bias" not in lp0["out_proj"]
            and self.norm_type in ("rms", "layer")
        )
        if compatible and hasattr(mixer, "dt_rank_"):   # Mamba-1 family
            from videomamba_tpu.ops.pallas.decode_step import (
                decode_stack_supported,
            )

            compatible = decode_stack_supported(
                mixer.d_model, mixer.d_inner, mixer.dt_rank_, mixer.d_state
            )
        elif compatible:                                 # Mamba-2 (SSD)
            from videomamba_tpu.ops.pallas.decode_step import (
                decode_stack_m2_supported,
            )

            compatible = decode_stack_m2_supported(
                mixer.d_model, mixer.d_inner, mixer.nheads, mixer.ngroups,
                mixer.d_state,
            ) and getattr(mixer, "D_has_hdim", False) is False
        if use_pallas and not compatible:
            raise ValueError(
                "use_pallas=True but the decode kernel does not support this "
                "model (needs bias-free projections, rms/layer norm, and "
                "either dt_rank+2*d_state <= 128 [Mamba-1] or ngroups == 1 "
                "with 128-aligned d_inner [Mamba-2])."
            )
        if use_pallas is None and not runnable:
            return False
        return compatible

    def _build_packs(self):
        """Stacked, lane-packed per-layer weights for the decode kernel."""
        from videomamba_tpu.ops.pallas.mixer_fused import PACK

        lp = self.stacked
        mixer = self.mixer
        r, n = mixer.dt_rank_, mixer.d_state
        d_inner = mixer.d_inner
        depth = self.model.depth

        nw = lp["norm"]["weight"][:, None, :]
        nb = lp["norm"].get("bias")
        nb = None if nb is None else nb[:, None, :]
        win = lp["mixer"]["in_proj"]["kernel"]
        wout = lp["mixer"]["out_proj"]["kernel"]
        conv_w = lp["mixer"]["conv1d"]["weight"]
        conv_b = lp["mixer"]["conv1d"].get("bias")
        conv_b = (
            jnp.zeros((depth, 1, d_inner), jnp.float32)
            if conv_b is None else conv_b.astype(jnp.float32)[:, None, :]
        )
        wx = lp["mixer"]["x_proj"]["kernel"]           # (K, Di, r+2n)
        wx_pack = jnp.zeros((depth, d_inner, PACK), wx.dtype)
        wx_pack = wx_pack.at[:, :, : r + 2 * n].set(wx)
        wdt = lp["mixer"]["dt_proj"]["kernel"]         # (K, r, Di)
        wdt_pack = jnp.zeros((depth, PACK, d_inner), wdt.dtype)
        wdt_pack = wdt_pack.at[:, :r, :].set(wdt)
        A = -jnp.exp(lp["mixer"]["A_log"].astype(jnp.float32))
        A = A.swapaxes(1, 2)                           # (K, N, Di)
        D = lp["mixer"]["D"].astype(jnp.float32)[:, None, :]
        dt_bias = lp["mixer"]["dt_proj"]["bias"].astype(
            jnp.float32)[:, None, :]
        return (nw, nb, win, wout, conv_w, conv_b, wx_pack, wdt_pack, A, D,
                dt_bias)

    def _build_packs_m2(self):
        """Stacked per-layer weights for the SSD decode kernel."""
        lp = self.stacked
        mixer = self.mixer
        depth = self.model.depth
        d_inner = mixer.d_inner
        nheads = mixer.nheads
        hdim = mixer.headdim
        conv_dim = mixer.conv_dim

        nw = lp["norm"]["weight"][:, None, :]
        nb = lp["norm"].get("bias")
        nb = None if nb is None else nb[:, None, :]
        win = lp["mixer"]["in_proj"]["kernel"]
        wout = lp["mixer"]["out_proj"]["kernel"]
        conv_w = lp["mixer"]["conv1d"]["weight"]
        conv_b = lp["mixer"]["conv1d"].get("bias")
        conv_b = (
            jnp.zeros((depth, 1, conv_dim), jnp.float32)
            if conv_b is None else conv_b.astype(jnp.float32)[:, None, :]
        )
        A = -jnp.exp(lp["mixer"]["A_log"].astype(jnp.float32))[:, None, :]
        D_hp = jnp.repeat(
            lp["mixer"]["D"].astype(jnp.float32), hdim, axis=1
        )[:, None, :]                                   # (K, 1, Di)
        dt_bias = lp["mixer"]["dt_bias"].astype(jnp.float32)[:, None, :]
        if mixer.rmsnorm:
            gate_nw = lp["mixer"]["norm"]["weight"].astype(
                jnp.float32)[:, None, :]
        else:
            gate_nw = jnp.ones((depth, 1, d_inner), jnp.float32)
        return (nw, nb, win, wout, conv_w, conv_b, A, D_hp, dt_bias,
                gate_nw)

    def _build_step_pallas_m2(self):
        from videomamba_tpu.ops import dispatch
        from videomamba_tpu.ops.norm import fused_add_norm
        from videomamba_tpu.ops.pallas.decode_step import (
            decode_stack_pallas_m2,
        )

        mixer = self.mixer
        norm_type = self.norm_type
        eps = self.eps
        rif32 = self.residual_in_fp32
        interpret = dispatch.interpret_mode() and not dispatch.on_tpu()
        dtype = self.conv_states.dtype
        nheads = mixer.nheads
        rmsnorm_gate = mixer.rmsnorm
        gate_eps = mixer.norm_epsilon

        def step(params, packs, conv_states, ssm_states, token):
            hidden, residual, new_conv, new_ssm = decode_stack_pallas_m2(
                token, *packs, conv_states=conv_states,
                ssm_states=ssm_states, nheads=nheads,
                norm_rms=(norm_type == "rms"), rmsnorm_gate=rmsnorm_gate,
                eps=eps, gate_eps=gate_eps, interpret=interpret,
            )
            feat = fused_add_norm(
                hidden.astype(dtype),
                params["norm"]["weight"], params["norm"].get("bias"),
                residual=residual, prenorm=False,
                residual_in_fp32=rif32, eps=eps, norm_type=norm_type,
            )
            return feat, new_conv, new_ssm

        return jax.jit(step, donate_argnums=(2, 3))

    def _build_step_pallas(self):
        from videomamba_tpu.ops import dispatch
        from videomamba_tpu.ops.norm import fused_add_norm
        from videomamba_tpu.ops.pallas.decode_step import decode_stack_pallas

        mixer = self.mixer
        norm_type = self.norm_type
        eps = self.eps
        rif32 = self.residual_in_fp32
        dt_rank = mixer.dt_rank_
        interpret = dispatch.interpret_mode() and not dispatch.on_tpu()
        dtype = self.conv_states.dtype

        def step(params, packs, conv_states, ssm_states, token):
            hidden, residual, new_conv, new_ssm = decode_stack_pallas(
                token, *packs, conv_states=conv_states,
                ssm_states=ssm_states, dt_rank=dt_rank,
                norm_rms=(norm_type == "rms"), eps=eps,
                interpret=interpret,
            )
            feat = fused_add_norm(
                hidden.astype(dtype),
                params["norm"]["weight"], params["norm"].get("bias"),
                residual=residual, prenorm=False,
                residual_in_fp32=rif32, eps=eps, norm_type=norm_type,
            )
            return feat, new_conv, new_ssm

        return jax.jit(step, donate_argnums=(2, 3))

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
        if self.backend == "pallas":
            feat, self.conv_states, self.ssm_states = self._step(
                self.model.params, self._packs, self.conv_states,
                self.ssm_states, token,
            )
        else:
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
        if self.backend == "pallas":
            convs = convs.swapaxes(2, 3)
            if ssms.ndim == 5:   # SSD (K, B, H, P, N) -> (K, B, N, H*P)
                k, b, h, p, n = ssms.shape
                ssms = ssms.reshape(k, b, h * p, n).swapaxes(2, 3)
            else:
                ssms = ssms.swapaxes(2, 3)
        self.conv_states = convs.astype(self.conv_states.dtype)
        self.ssm_states = ssms.astype(self.ssm_states.dtype)


def time_fn(fn, *args, warmup: int = 2, iters: int = 10) -> Tuple[float, List[float]]:
    """(median_seconds, all_times) for fn(*args), synced per call.

    CAUTION: on tunneled device platforms (axon) ``block_until_ready`` can
    ack dispatch rather than completion, so per-call times here bound the
    round-trip, not device time. For honest sub-ms numbers use the
    chain-differenced methodology in bench.py (``_chain_seconds_per_iter``),
    which syncs via ``jax.device_get`` and cancels the fixed round-trip.
    """
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
