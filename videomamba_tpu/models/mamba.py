"""Mamba selective-SSM mixer — TPU-native functional module.

Capability twin of the reference ``Mamba`` layer
(/root/reference/models/videomamba/mamba_simple.py:175-590), redesigned for
JAX/XLA: parameters are an explicit pytree, streaming state is carried
functionally (the reference's best path — its in-place ``inference_params``
cache collapses onto the same mechanism), and every code path is jit-stable
(fixed shapes, fixed dtypes).

Computation per token sequence x (B, L, d_model):

    xz = x @ W_in                       -> (B, L, 2*d_inner)   [MXU]
    x', z = split(xz)
    x' = silu(causal_depthwise_conv(x'))                       [VPU]
    dt, B, C = split(x' @ W_x)          -> rank/d_state each   [MXU]
    dt = dt @ W_dt
    y = selective_scan(x', dt, A, B, C, D, z)                  [scan]
    out = y @ W_out                                            [MXU]

Streaming contract (frozen, version 1.0.0): per layer
``conv_state (B, d_inner, d_conv)`` holds the last d_conv raw conv inputs,
``ssm_state (B, d_inner, d_state)`` the SSM recurrence state. Passing
``state=(conv_state, ssm_state), return_state=True`` yields
``(out, (new_conv_state, new_ssm_state))`` such that chunked execution
reproduces full-sequence execution exactly (layer-level parity bar 1e-4,
reference scripts/check_streaming_state.py:55).
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from videomamba_tpu.models import initializers as init
from videomamba_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update
from videomamba_tpu.ops.selective_scan import (
    selective_scan_bld,
    selective_state_update,
)

Array = jax.Array
Params = Dict[str, Any]
LayerState = Tuple[Array, Array]

_FUSED_KILL_SWITCH = "VIDEOMAMBA_DISABLE_FUSED"


def _fused_disabled_by_env() -> bool:
    return os.getenv(_FUSED_KILL_SWITCH, "").lower() in {"1", "true", "yes", "y", "on"}


def _conv_window(x: Array, conv_state: Optional[Array], width: int) -> Array:
    """Updated (B, D, W) raw-input window = last W inputs of [state || x]."""
    if conv_state is not None:
        full = jnp.concatenate(
            [conv_state.swapaxes(1, 2).astype(x.dtype), x], axis=1
        )
    else:
        full = jnp.pad(x, ((0, 0), (width, 0), (0, 0)))
    return full[:, -width:].swapaxes(1, 2)


@jax.custom_vjp
def _fused_mixer(x_in, z_in, conv_w, conv_b, wx, wdt, dt_bias, A, D, h0,
                 conv_state):
    """Fused conv+proj+scan+gate core (Pallas); see ops/pallas/mixer_fused.

    Returns (y (B, L, d_inner), h_last (B, d_inner, N)). Gradient rule:
    recompute the cheap XLA pieces, reuse the Pallas scan backward.
    """
    from videomamba_tpu.ops.pallas.mixer_fused import (
        mixer_fused_pallas,
        pack_weights,
    )

    r, n = wdt.shape[0], A.shape[1]
    wx_pack, wdt_pack = pack_weights(wx, wdt, r, n)
    return mixer_fused_pallas(
        x_in, z_in, conv_w, conv_b, wx_pack, wdt_pack, A, D, dt_bias, h0,
        conv_state, highest=(wx.dtype == jnp.float32),
    )


def _fused_mixer_fwd(x_in, z_in, conv_w, conv_b, wx, wdt, dt_bias, A, D, h0,
                     conv_state):
    from videomamba_tpu.ops.pallas.mixer_fused import (
        mixer_fused_pallas,
        pack_weights,
    )

    r, n = wdt.shape[0], A.shape[1]
    wx_pack, wdt_pack = pack_weights(wx, wdt, r, n)
    y, h_last, hckpt = mixer_fused_pallas(
        x_in, z_in, conv_w, conv_b, wx_pack, wdt_pack, A, D, dt_bias, h0,
        conv_state, highest=(wx.dtype == jnp.float32), checkpoints=True,
    )
    res = (x_in, z_in, conv_w, conv_b, wx, wdt, dt_bias, A, D, h0,
           conv_state, hckpt)
    return (y, h_last), res


def _mixer_bwd_backend() -> str:
    """"fused" (single mega-kernel, default) or "composite" (XLA recompute
    chained to scan_bwd_pallas) via VIDEOMAMBA_MIXER_BWD."""
    forced = os.getenv("VIDEOMAMBA_MIXER_BWD", "").strip().lower()
    if forced in {"fused", "composite"}:
        return forced
    return "fused"


def _fused_mixer_bwd(res, cts):
    (x_in, z_in, conv_w, conv_b, wx, wdt, dt_bias, A, D, h0,
     conv_state, hckpt) = res
    g_y, g_hlast = cts
    from videomamba_tpu.ops.pallas.scan import scan_bwd_pallas

    r, n = wdt.shape[0], A.shape[1]

    if _mixer_bwd_backend() == "fused":
        # Single mega-kernel backward: conv/proj recompute, reverse scan and
        # every gradient contraction in one pallas_call (ops/pallas/mixer_bwd).
        from videomamba_tpu.ops.pallas.mixer_bwd import (
            PACK,
            mixer_bwd_pallas,
            mixer_bwd_supported,
        )
        from videomamba_tpu.ops.pallas.mixer_fused import pack_weights

        if mixer_bwd_supported(x_in.shape[-1], r, n):
            wx_pack, wdt_pack = pack_weights(wx, wdt, r, n)
            (dx, dz, dcw, dcb, dwxp, dwdtp, dbias_g, dA, dD, dh0,
             dcst) = mixer_bwd_pallas(
                x_in, z_in, conv_w, conv_b, wx_pack, wdt_pack, A, D,
                dt_bias, conv_state, hckpt, g_y, g_hlast,
                softplus=True, highest=(wx.dtype == jnp.float32),
            )
            dwx = jnp.concatenate(
                [dwxp[:, :r], dwxp[:, PACK:PACK + n],
                 dwxp[:, 2 * PACK:2 * PACK + n]], axis=1,
            )
            return (
                dx.astype(x_in.dtype),
                dz.astype(z_in.dtype),
                dcw.astype(conv_w.dtype),
                dcb.astype(conv_b.dtype),
                dwx.astype(wx.dtype),
                dwdtp[:r].astype(wdt.dtype),
                dbias_g.astype(dt_bias.dtype),
                dA.astype(A.dtype),
                dD.astype(D.dtype),
                dh0.astype(h0.dtype),
                dcst.astype(conv_state.dtype),
            )

    # Recompute the pre-scan intermediates (cheap: one conv + two small mms).
    def conv_fn(x_, w_, b_, st_):
        return causal_conv1d(
            x_, w_, b_, activation="silu", initial_state=st_
        )

    conv_out, conv_vjp = jax.vjp(conv_fn, x_in, conv_w, conv_b, conv_state)
    mm_in = conv_out.astype(wx.dtype)
    xdbl = (mm_in @ wx).astype(jnp.float32)
    delta_raw = (xdbl[..., :r].astype(wdt.dtype) @ wdt).astype(jnp.float32)
    B_ssm = xdbl[..., r:r + n]
    C_ssm = xdbl[..., r + n:]

    grads = scan_bwd_pallas(
        conv_out, delta_raw, A, B_ssm, C_ssm, D, z_in, dt_bias, hckpt,
        g_y, g_hlast, softplus=True, has_z=True,
    )
    du_scan, ddelta_raw, dA, dB, dC, dD, dz, ddtbias, dh0 = grads

    ddelta_raw = ddelta_raw.astype(jnp.float32)
    dxdbl = jnp.concatenate(
        [jnp.einsum("bld,rd->blr", ddelta_raw, wdt.astype(jnp.float32)),
         dB.astype(jnp.float32), dC.astype(jnp.float32)],
        axis=-1,
    )
    dwdt = jnp.einsum(
        "blr,bld->rd", xdbl[..., :r], ddelta_raw
    ).astype(wdt.dtype)
    dconv_from_proj = jnp.einsum(
        "blk,dk->bld", dxdbl, wx.astype(jnp.float32)
    )
    dwx = jnp.einsum(
        "bld,blk->dk", mm_in.astype(jnp.float32), dxdbl
    ).astype(wx.dtype)

    dconv_out = (du_scan.astype(jnp.float32) + dconv_from_proj).astype(
        conv_out.dtype
    )
    dx_in, dconv_w, dconv_b, dconv_state = conv_vjp(dconv_out)

    return (
        dx_in.astype(x_in.dtype),
        dz.astype(z_in.dtype),
        dconv_w.astype(conv_w.dtype),
        dconv_b.astype(conv_b.dtype),
        dwx,
        dwdt,
        ddtbias.astype(dt_bias.dtype),
        dA.astype(A.dtype),
        dD.astype(D.dtype),
        dh0.astype(h0.dtype),
        dconv_state.astype(conv_state.dtype),
    )


_fused_mixer.defvjp(_fused_mixer_fwd, _fused_mixer_bwd)


@dataclasses.dataclass
class InferenceCache:
    """Decode-time cache — functional twin of the reference's
    ``InferenceParamsLike`` protocol (mamba_simple.py:25-27).

    Holds per-layer (conv_state, ssm_state) keyed by layer_idx. The arrays
    themselves are immutable; "in-place update" happens at the Python dict
    level, which preserves the reference calling convention (the cache object
    is threaded through calls and mutated).
    """

    seqlen_offset: int = 0
    key_value_memory_dict: Dict[int, LayerState] = dataclasses.field(
        default_factory=dict
    )


@dataclasses.dataclass(frozen=True)
class Mamba:
    """Selective-SSM mixer. Hyperparameters only; params live in a pytree.

    Mirrors the reference constructor surface (mamba_simple.py:176-215),
    including the ``bimamba`` compatibility flag (single directional scan;
    bidirectionality is composed externally, see BiMambaRefinerBlock) and the
    ``VIDEOMAMBA_DISABLE_FUSED`` kill switch. ``use_fast_path=True`` selects
    the fused Pallas kernels on TPU; ``False`` forces the pure-XLA path.
    """

    d_model: int
    d_state: int = 16
    d_conv: int = 4
    expand: int = 2
    dt_rank: Union[int, str] = "auto"
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init: str = "random"
    dt_scale: float = 1.0
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    use_fast_path: bool = True
    layer_idx: Optional[int] = None
    bimamba: bool = True
    scan_chunk_size: int = 64
    sp_axis: Optional[str] = None

    def __post_init__(self):
        if _fused_disabled_by_env() and self.use_fast_path:
            object.__setattr__(self, "use_fast_path", False)

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def dt_rank_(self) -> int:
        if self.dt_rank == "auto":
            return math.ceil(self.d_model / 16)
        return int(self.dt_rank)

    # ------------------------------------------------------------------ init

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        """Initialize parameters (distributions per mamba_simple.py:218-281).

        Layout notes: Linear kernels are stored (in, out); the depthwise conv
        weight is (d_conv, d_inner) with channels minor. ``A_log``, ``D`` and
        ``dt_proj.bias`` always stay float32 (the reference keeps them fp32).
        """
        d_in, r, n = self.d_inner, self.dt_rank_, self.d_state
        keys = jax.random.split(key, 6)

        params: Params = {}
        if self.bias:
            k, b = init.torch_linear_default(keys[0], self.d_model, 2 * d_in, True)
            params["in_proj"] = {"kernel": k.astype(dtype), "bias": b.astype(dtype)}
        else:
            k = init.torch_linear_default(keys[0], self.d_model, 2 * d_in)
            params["in_proj"] = {"kernel": k.astype(dtype)}

        if self.conv_bias:
            w, b = init.torch_conv_default(
                keys[1], (self.d_conv, d_in), fan_in=self.d_conv, bias_shape=(d_in,)
            )
            params["conv1d"] = {"weight": w.astype(dtype), "bias": b.astype(dtype)}
        else:
            w = init.torch_conv_default(keys[1], (self.d_conv, d_in), fan_in=self.d_conv)
            params["conv1d"] = {"weight": w.astype(dtype)}

        params["x_proj"] = {
            "kernel": init.torch_linear_default(keys[2], d_in, r + 2 * n).astype(dtype)
        }

        dt_init_std = r ** -0.5 * self.dt_scale
        if self.dt_init == "constant":
            dt_kernel = jnp.full((r, d_in), dt_init_std, jnp.float32)
        elif self.dt_init == "random":
            dt_kernel = jax.random.uniform(
                keys[3], (r, d_in), jnp.float32, -dt_init_std, dt_init_std
            )
        else:
            raise NotImplementedError(f"dt_init={self.dt_init!r}")
        params["dt_proj"] = {
            "kernel": dt_kernel.astype(dtype),
            "bias": init.dt_bias_init(
                keys[4], d_in, self.dt_min, self.dt_max, self.dt_init_floor
            ),  # fp32, _no_reinit in the reference
        }

        params["A_log"] = init.s4d_real_A_log(d_in, n)  # fp32, no weight decay
        params["D"] = jnp.ones((d_in,), jnp.float32)  # fp32, no weight decay

        if self.bias:
            k, b = init.torch_linear_default(keys[5], d_in, self.d_model, True)
            params["out_proj"] = {"kernel": k.astype(dtype), "bias": b.astype(dtype)}
        else:
            k = init.torch_linear_default(keys[5], d_in, self.d_model)
            params["out_proj"] = {"kernel": k.astype(dtype)}
        return params

    # --------------------------------------------------------------- forward

    def __call__(
        self,
        params: Params,
        hidden_states: Array,
        state: Optional[LayerState] = None,
        return_state: bool = False,
        ssm_state: Optional[Array] = None,
        return_ssm_state: bool = False,
        inference_params: Optional["InferenceCache"] = None,
    ) -> Union[Array, Tuple[Array, LayerState], Tuple[Array, Array]]:
        """Apply the mixer.

        Args:
            params: parameter pytree from :meth:`init`.
            hidden_states: (B, L, d_model).
            state: optional (conv_state (B, d_inner, d_conv),
                ssm_state (B, d_inner, d_state)) carried streaming state.
            return_state: also return the updated state tuple.
            ssm_state: SSM-only initial state (no conv context), matching the
                reference's ``ssm_state=`` argument (mamba_simple.py:287).
            return_ssm_state: with ``ssm_state``, also return the advanced
                bare SSM state — the functional equivalent of the reference's
                in-place ``ssm_state.copy_(last_state)``
                (mamba_simple.py:419-439, use_inplace_ssm): the scan runs with
                ``return_last_state=True`` and the caller receives the
                advanced array instead of having its buffer mutated.

        Returns:
            out (B, L, d_model), or (out, (new_conv_state, new_ssm_state))
            with ``return_state``, or (out, new_ssm_state) with
            ``return_ssm_state``. New states keep the dtypes of the incoming
            states (jit-stable pytrees); with no incoming state, conv_state
            takes the input dtype and ssm_state is float32, like the
            reference fresh-state path.
        """
        if state is not None and ssm_state is not None:
            raise ValueError("Pass either state or ssm_state, not both.")
        if return_ssm_state and ssm_state is None:
            raise ValueError("return_ssm_state requires ssm_state.")
        if inference_params is not None and state is not None:
            raise ValueError("state is not supported with inference_params.")
        if inference_params is not None and return_ssm_state:
            raise ValueError(
                "return_ssm_state is not supported with inference_params; "
                "the decode cache already carries the advanced state."
            )

        if self.sp_axis is not None:
            # Sequence-parallel route: hidden_states is the local time shard
            # of a shard_map over mesh axis ``sp_axis``. Cross-shard conv
            # halos and the recurrence combine live in parallel.sequence.
            if inference_params is not None:
                raise ValueError(
                    "inference_params is not supported under sequence "
                    "parallelism; decode on a single shard."
                )
            from videomamba_tpu.parallel.sequence import sequence_parallel_mixer

            return sequence_parallel_mixer(
                self, params, hidden_states,
                axis_name=self.sp_axis, state=state,
                return_state=return_state, ssm_state=ssm_state,
                return_ssm_state=return_ssm_state,
                method=self.scan_method,
            )

        bsz, seqlen, _ = hidden_states.shape

        if inference_params is not None:
            # Decode-cache path (reference mamba_simple.py:316-330): lazy
            # per-layer allocation, reallocation on batch-size change, step()
            # for post-prefill tokens, prefill writes the cache in place
            # (Python-dict level) and ignores return_state.
            conv_state, cache_ssm = self._get_states_from_cache(
                inference_params, bsz
            )
            if ssm_state is None:
                ssm_state = cache_ssm
            if inference_params.seqlen_offset > 0:
                out, new_conv, new_ssm = self.step(
                    params, hidden_states, conv_state, ssm_state
                )
                assert self.layer_idx is not None
                inference_params.key_value_memory_dict[self.layer_idx] = (
                    new_conv, new_ssm
                )
                return out
            # Prefill always convs with zero left-context and overwrites the
            # conv window (reference :372-399), while the SSM scan starts
            # from the cached ssm_state (:418-435, use_inplace_ssm).
            out, (new_conv, new_ssm) = self(
                params,
                hidden_states,
                state=(jnp.zeros_like(conv_state), ssm_state),
                return_state=True,
            )
            assert self.layer_idx is not None
            inference_params.key_value_memory_dict[self.layer_idx] = (
                new_conv, new_ssm
            )
            return out

        conv_state = None
        if state is not None:
            conv_state, ssm_state = state

        # return_state wants the full (conv, ssm) tuple; return_ssm_state
        # wants only the advanced scan state (the reference's in-place path
        # never builds a new conv window either, mamba_simple.py:380-393).
        need_state = return_state or return_ssm_state

        xz = hidden_states @ params["in_proj"]["kernel"]
        if "bias" in params["in_proj"]:
            xz = xz + params["in_proj"]["bias"]
        x, z = jnp.split(xz, 2, axis=-1)

        if self._use_fused_mixer(params):
            # Fully-fused fast path: conv + x_proj + dt_proj + scan + gate in
            # one Pallas kernel (the mamba_inner_fn equivalent) — with
            # streaming state in and out, unlike the reference's fused path
            # which is stateless-only (mamba_simple.py:343-367).
            h0 = (
                ssm_state
                if ssm_state is not None
                else jnp.zeros((bsz, self.d_inner, self.d_state), jnp.float32)
            )
            cstate_in = (
                conv_state
                if conv_state is not None
                else jnp.zeros((bsz, self.d_inner, self.d_conv), x.dtype)
            )
            A = -jnp.exp(params["A_log"].astype(jnp.float32))
            y, h_last = _fused_mixer(
                x, z,
                params["conv1d"]["weight"], params["conv1d"]["bias"],
                params["x_proj"]["kernel"], params["dt_proj"]["kernel"],
                params["dt_proj"]["bias"].astype(jnp.float32),
                A, params["D"].astype(jnp.float32), h0, cstate_in,
            )
            out = y @ params["out_proj"]["kernel"]
            if "bias" in params["out_proj"]:
                out = out + params["out_proj"]["bias"]
            if not need_state:
                return out
            new_ssm_state = (
                h_last.astype(ssm_state.dtype) if ssm_state is not None else h_last
            )
            if return_ssm_state:
                return out, new_ssm_state
            new_conv_state = _conv_window(x, conv_state, self.d_conv)
            if conv_state is not None:
                new_conv_state = new_conv_state.astype(conv_state.dtype)
            return out, (new_conv_state, new_ssm_state)

        # Conv stays on the XLA path: measured on v5e, the shifted-multiply
        # composition fuses into one pass and beats the Pallas conv kernel at
        # B=1 (0.16ms vs 0.30ms, Base shapes) and ties it at B=4. The kernel
        # remains available via causal_conv1d(use_pallas=True).
        conv_out = causal_conv1d(
            x,
            params["conv1d"]["weight"],
            params["conv1d"].get("bias"),
            activation="silu",
            initial_state=conv_state,
            return_final_state=return_state,
        )
        if return_state:
            conv_out, new_conv_state = conv_out
            if conv_state is not None:
                new_conv_state = new_conv_state.astype(conv_state.dtype)

        x_dbl = conv_out @ params["x_proj"]["kernel"]
        r, n = self.dt_rank_, self.d_state
        dt_low = x_dbl[..., :r]
        B_ssm = x_dbl[..., r:r + n]
        C_ssm = x_dbl[..., r + n:]
        dt = dt_low @ params["dt_proj"]["kernel"]

        A = -jnp.exp(params["A_log"].astype(jnp.float32))

        scan_out = selective_scan_bld(
            conv_out,
            dt,
            A,
            B_ssm,
            C_ssm,
            D=params["D"].astype(jnp.float32),
            z=z,
            delta_bias=params["dt_proj"]["bias"].astype(jnp.float32),
            delta_softplus=True,
            initial_state=ssm_state,
            return_last_state=need_state,
            method=self.scan_method,
            chunk_size=self.scan_chunk_size,
        )
        if need_state:
            y, new_ssm_state = scan_out
            if ssm_state is not None:
                new_ssm_state = new_ssm_state.astype(ssm_state.dtype)
        else:
            y = scan_out

        out = y @ params["out_proj"]["kernel"]
        if "bias" in params["out_proj"]:
            out = out + params["out_proj"]["bias"]

        if return_ssm_state:
            return out, new_ssm_state
        if return_state:
            return out, (new_conv_state, new_ssm_state)
        return out

    def _use_fused_mixer(self, params: Params) -> bool:
        """Take the fully-fused Pallas mixer when everything lines up."""
        if not self.use_fast_path or self.scan_method != "pallas":
            return False
        if "bias" not in params["conv1d"]:
            return False
        from videomamba_tpu.ops.pallas.mixer_fused import mixer_fused_supported

        return mixer_fused_supported(self.d_inner, self.dt_rank_, self.d_state)

    @property
    def scan_method(self) -> str:
        """Scan backend: fused Pallas kernel when fast path is on (falls back
        to the chunked XLA scan off-TPU), chunked XLA otherwise."""
        if self.use_fast_path:
            from videomamba_tpu.ops import dispatch

            return dispatch.preferred_scan_method()
        return "chunked"

    # ------------------------------------------------------------ decode step

    def step(
        self, params: Params, hidden_states: Array, conv_state: Array, ssm_state: Array
    ) -> Tuple[Array, Array, Array]:
        """Single-token decode step (functional twin of mamba_simple.py:453-497).

        Args:
            hidden_states: (B, 1, d_model).
        Returns:
            (out (B, 1, d_model), new_conv_state, new_ssm_state).
        """
        if hidden_states.shape[1] != 1:
            raise ValueError("step() decodes exactly one token at a time.")
        x_tok = hidden_states[:, 0]
        xz = x_tok @ params["in_proj"]["kernel"]
        if "bias" in params["in_proj"]:
            xz = xz + params["in_proj"]["bias"]
        x, z = jnp.split(xz, 2, axis=-1)

        x, new_conv_state = causal_conv1d_update(
            x, conv_state, params["conv1d"]["weight"], params["conv1d"].get("bias")
        )
        x_db = x @ params["x_proj"]["kernel"]
        r, n = self.dt_rank_, self.d_state
        dt = x_db[..., :r] @ params["dt_proj"]["kernel"]
        B_ssm = x_db[..., r:r + n]
        C_ssm = x_db[..., r + n:]
        A = -jnp.exp(params["A_log"].astype(jnp.float32))
        y, new_ssm_state = selective_state_update(
            ssm_state,
            x,
            dt,
            A,
            B_ssm,
            C_ssm,
            D=params["D"],
            z=z,
            dt_bias=params["dt_proj"]["bias"],
            dt_softplus=True,
        )
        out = y @ params["out_proj"]["kernel"]
        if "bias" in params["out_proj"]:
            out = out + params["out_proj"]["bias"]
        return out[:, None], new_conv_state, new_ssm_state

    # ----------------------------------------------------------- state alloc

    def allocate_state(
        self, batch_size: int, dtype: Optional[jnp.dtype] = None
    ) -> LayerState:
        """Zero (conv_state, ssm_state) for streaming (mamba_simple.py:522-544).

        dtype defaults to float32 (parameter-default dtype); pass the model's
        compute dtype explicitly for bf16 serving.
        """
        dtype = jnp.float32 if dtype is None else dtype
        conv_state = jnp.zeros((batch_size, self.d_inner, self.d_conv), dtype)
        ssm_state = jnp.zeros((batch_size, self.d_inner, self.d_state), dtype)
        return conv_state, ssm_state

    def allocate_inference_cache(
        self, batch_size: int, max_seqlen: int = 1, dtype: Optional[jnp.dtype] = None
    ) -> LayerState:
        """Decode-cache allocation — same shapes as :meth:`allocate_state`
        (the reference's two spellings of d_inner, mamba_simple.py:499-520)."""
        del max_seqlen
        return self.allocate_state(batch_size, dtype=dtype)

    def _get_states_from_cache(
        self,
        inference_params: "InferenceCache",
        batch_size: int,
        initialize_states: bool = False,
    ) -> LayerState:
        """Lazy cache lookup with batch-size reallocation
        (mamba_simple.py:546-590)."""
        if self.layer_idx is None:
            raise ValueError("inference_params requires a layer_idx.")
        cache = inference_params.key_value_memory_dict
        if self.layer_idx not in cache:
            cache[self.layer_idx] = self.allocate_state(batch_size)
        else:
            conv_state, ssm_state = cache[self.layer_idx]
            if (
                conv_state.shape[0] != batch_size
                or ssm_state.shape[0] != batch_size
            ):
                cache[self.layer_idx] = self.allocate_state(batch_size)
            elif initialize_states:
                cache[self.layer_idx] = (
                    jnp.zeros_like(conv_state), jnp.zeros_like(ssm_state)
                )
        return cache[self.layer_idx]
