"""Mamba-2 (SSD) mixer — the MXU-native alternative to the Mamba-1 mixer.

The reference repo is Mamba-1 only; this module exists because the measured
walk floor (ROADMAP "walk-floor analysis") showed Mamba-1's per-(d, n) decay
recurrence is VPU-issue-bound at ~19 ns/step on v5e — the training/serving
ceiling of the whole framework. Mamba-2 (Dao & Gu, arXiv:2405.21060) restricts
the decay to a scalar per head, which lets ops/ssd.py compute the sequence mix
with chunked matmuls on the MXU instead of a serial VPU walk.

Design mirrors the framework's ``Mamba`` mixer (models/mamba.py) exactly in
its *call surface* — same functional streaming state, ``step()``, decode
cache, ``allocate_state`` — so :class:`videomamba_tpu.models.block.Block` and
the full model compose with it unchanged (``ssm_cfg={"layer": "Mamba2"}``).
Parameterization follows the public ``mamba_ssm.modules.mamba2.Mamba2``
module surface (single in_proj producing [z | x B C | dt], depthwise conv
over the [x B C] slab, per-head A/dt_bias/D, gated RMSNorm before out_proj)
so released Mamba-2 checkpoints map onto the same names.

Streaming contract (same duck-typed frozen semantics as streaming.py):
``conv_state (B, d_inner + 2*ngroups*d_state, d_conv)`` raw-input window,
``ssm_state (B, nheads, headdim, d_state)`` float32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from videomamba_tpu.models import initializers as init
from videomamba_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update
from videomamba_tpu.ops.dispatch import preferred_ssd_method
from videomamba_tpu.ops.norm import rms_norm
from videomamba_tpu.models.mamba import _conv_window
from videomamba_tpu.ops.pallas.ssd_scan import (
    pallas_ssd_supported,
    ssd_mixer_pallas,
)
from videomamba_tpu.ops.ssd import ssd_chunked, ssd_ref, ssd_state_update

Array = jax.Array
Params = Dict[str, Any]
LayerState = Tuple[Array, Array]


@dataclasses.dataclass(frozen=True)
class Mamba2:
    """SSD mixer. Hyperparameters only; params live in a pytree.

    ``use_fast_path=True`` selects the chunked-matmul SSD (MXU); ``False``
    the sequential ``lax.scan`` oracle — both are exact (fp32 recurrence),
    unlike Mamba-1 where the fast path swaps kernels.
    """

    d_model: int
    d_state: int = 64
    d_conv: int = 4
    expand: int = 2
    headdim: int = 64
    ngroups: int = 1
    A_init_range: Tuple[float, float] = (1.0, 16.0)
    dt_min: float = 0.001
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4
    conv_bias: bool = True
    bias: bool = False
    rmsnorm: bool = True
    norm_epsilon: float = 1e-5
    chunk_size: int = 64
    use_fast_path: bool = True
    layer_idx: Optional[int] = None
    bimamba: bool = False  # accepted for create_block parity; unused
    sp_axis: Optional[str] = None

    # Block-level fusion is a Mamba-1 kernel; the SSD path is already MXU.
    supports_block_fusion = False

    def __post_init__(self):
        if self.d_inner % self.headdim:
            raise ValueError(
                f"d_inner={self.d_inner} must be a multiple of "
                f"headdim={self.headdim}"
            )
        if self.nheads % self.ngroups:
            raise ValueError(
                f"nheads={self.nheads} must be a multiple of "
                f"ngroups={self.ngroups}"
            )

    @property
    def d_inner(self) -> int:
        return int(self.expand * self.d_model)

    @property
    def nheads(self) -> int:
        return self.d_inner // self.headdim

    @property
    def conv_dim(self) -> int:
        return self.d_inner + 2 * self.ngroups * self.d_state

    @property
    def d_in_proj(self) -> int:
        return 2 * self.d_inner + 2 * self.ngroups * self.d_state + self.nheads

    # ------------------------------------------------------------------ init

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        """Parameter init following the mamba_ssm Mamba2 distributions:
        per-head ``A_log = log(U(A_init_range))``, softplus-inverse dt bias,
        D = 1, torch Linear/Conv defaults elsewhere. A_log/dt_bias/D stay
        float32 (optimizer no-decay groups match Mamba-1's)."""
        keys = jax.random.split(key, 5)
        params: Params = {}

        if self.bias:
            k, b = init.torch_linear_default(
                keys[0], self.d_model, self.d_in_proj, True
            )
            params["in_proj"] = {"kernel": k.astype(dtype), "bias": b.astype(dtype)}
        else:
            k = init.torch_linear_default(keys[0], self.d_model, self.d_in_proj)
            params["in_proj"] = {"kernel": k.astype(dtype)}

        if self.conv_bias:
            w, b = init.torch_conv_default(
                keys[1], (self.d_conv, self.conv_dim), fan_in=self.d_conv,
                bias_shape=(self.conv_dim,),
            )
            params["conv1d"] = {"weight": w.astype(dtype), "bias": b.astype(dtype)}
        else:
            w = init.torch_conv_default(
                keys[1], (self.d_conv, self.conv_dim), fan_in=self.d_conv
            )
            params["conv1d"] = {"weight": w.astype(dtype)}

        params["dt_bias"] = init.dt_bias_init(
            keys[2], self.nheads, self.dt_min, self.dt_max, self.dt_init_floor
        )
        lo, hi = self.A_init_range
        if not (0 < lo <= hi):
            raise ValueError(f"A_init_range={self.A_init_range!r} must be positive")
        a = jax.random.uniform(keys[3], (self.nheads,), jnp.float32, lo, hi)
        params["A_log"] = jnp.log(a)
        params["D"] = jnp.ones((self.nheads,), jnp.float32)

        if self.rmsnorm:
            params["norm"] = {"weight": jnp.ones((self.d_inner,), jnp.float32)}

        if self.bias:
            k, b = init.torch_linear_default(
                keys[4], self.d_inner, self.d_model, True
            )
            params["out_proj"] = {"kernel": k.astype(dtype), "bias": b.astype(dtype)}
        else:
            k = init.torch_linear_default(keys[4], self.d_inner, self.d_model)
            params["out_proj"] = {"kernel": k.astype(dtype)}
        return params

    # -------------------------------------------------------------- forward

    def _split_zxbcdt(self, zxbcdt: Array) -> Tuple[Array, Array, Array]:
        d_in, cdim = self.d_inner, self.conv_dim
        z = zxbcdt[..., :d_in]
        xBC = zxbcdt[..., d_in:d_in + cdim]
        dt = zxbcdt[..., d_in + cdim:]
        return z, xBC, dt

    def _split_xbc(self, xBC: Array) -> Tuple[Array, Array, Array]:
        d_in, gn = self.d_inner, self.ngroups * self.d_state
        x = xBC[..., :d_in]
        B = xBC[..., d_in:d_in + gn]
        C = xBC[..., d_in + gn:]
        return x, B, C

    def _gate_and_project(self, params: Params, y: Array, z: Array) -> Array:
        if self.rmsnorm:
            gated = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
            y = rms_norm(
                gated, params["norm"]["weight"], eps=self.norm_epsilon
            ).astype(z.dtype)
        else:
            y = (y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))).astype(
                z.dtype
            )
        out = y @ params["out_proj"]["kernel"]
        if "bias" in params["out_proj"]:
            out = out + params["out_proj"]["bias"]
        return out

    def __call__(
        self,
        params: Params,
        hidden_states: Array,
        state: Optional[LayerState] = None,
        return_state: bool = False,
        ssm_state: Optional[Array] = None,
        return_ssm_state: bool = False,
        inference_params=None,
    ) -> Union[Array, Tuple[Array, LayerState], Tuple[Array, Array]]:
        """Forward over (B, L, d_model); same state plumbing as Mamba-1.

        ``state=(conv_state, ssm_state), return_state=True`` → exact chunked
        streaming. Bare ``ssm_state``/``return_ssm_state`` mirrors the Mamba-1
        ssm-only path: conv restarts each chunk with zero left-context and the
        *advanced* SSM state is returned (models/mamba.py return semantics).
        """
        if state is not None and ssm_state is not None:
            raise ValueError("pass either state or ssm_state, not both.")
        if self.sp_axis is not None:
            # Sequence-parallel route: hidden_states is the local time shard
            # of a shard_map over mesh axis ``sp_axis``; the conv halo and
            # the recurrence combine live in parallel.sequence. Cheaper than
            # Mamba-1's SP — the segment decay is (B, H) scalars per head.
            if inference_params is not None:
                raise ValueError(
                    "inference_params is not supported under sequence "
                    "parallelism; decode on a single shard."
                )
            from videomamba_tpu.parallel.sequence import (
                sequence_parallel_mixer_m2,
            )

            return sequence_parallel_mixer_m2(
                self, params, hidden_states,
                axis_name=self.sp_axis, state=state,
                return_state=return_state, ssm_state=ssm_state,
                return_ssm_state=return_ssm_state,
            )
        if inference_params is not None:
            if state is not None or ssm_state is not None:
                raise ValueError("state is not supported with inference_params.")
            return self._forward_with_cache(params, hidden_states, inference_params)

        bsz = hidden_states.shape[0]
        conv_state = None
        if state is not None:
            conv_state, ssm_state = state
        need_state = return_state or return_ssm_state

        h, p, g, n = self.nheads, self.headdim, self.ngroups, self.d_state
        method = "ref"
        if self.use_fast_path:
            method = preferred_ssd_method()
            if method == "pallas" and not pallas_ssd_supported(
                h, p, g, n, self.chunk_size
            ):
                method = "chunked"

        if method == "pallas" and self._pmixer_ok(params):
            # Projected-mixer op: in_proj + conv + scan + gate/norm +
            # out_proj in ONE pallas_call for inference (the zx/gated HBM
            # round trips disappear — the measured serving winner). Under
            # jax.grad its custom-vjp rules run the DECOMPOSED route (XLA
            # projections around the merged mixer core) — the measured
            # training winner; see ops.dispatch.ssd_train_route.
            from videomamba_tpu.ops.pallas.ssd_block import (
                ssd_projected_mixer,
            )

            A = -jnp.exp(params["A_log"].astype(jnp.float32))
            h0 = (ssm_state.astype(jnp.float32)
                  if ssm_state is not None else None)
            out, new_ssm_state = ssd_projected_mixer(
                hidden_states, A, params["in_proj"]["kernel"],
                params["out_proj"]["kernel"], params["conv1d"]["weight"],
                params["conv1d"].get("bias"), params["D"],
                params["dt_bias"], initial_state=h0, conv_state=conv_state,
                norm_weight=(params["norm"]["weight"] if self.rmsnorm
                             else None),
                norm_eps=self.norm_epsilon, chunk_size=self.chunk_size,
                nheads=h, hdim=p, ngroups=g, d_state=n,
            )
            if need_state and ssm_state is not None:
                new_ssm_state = new_ssm_state.astype(ssm_state.dtype)
            if return_state:
                # Conv window: recompute the raw [x B C] tail for the last
                # W positions only (one tiny matmul; the kernel never
                # materializes zx in HBM).
                w = self.d_conv
                win = params["in_proj"]["kernel"]
                raw_tail = hidden_states[:, -w:] @ win[
                    :, self.d_inner:self.d_inner + self.conv_dim]
                new_conv_state = _conv_window(raw_tail, conv_state, w)
                if conv_state is not None:
                    new_conv_state = new_conv_state.astype(conv_state.dtype)
                return out, (new_conv_state, new_ssm_state)
            if return_ssm_state:
                return out, new_ssm_state
            return out

        zxbcdt = hidden_states @ params["in_proj"]["kernel"]
        if "bias" in params["in_proj"]:
            zxbcdt = zxbcdt + params["in_proj"]["bias"]

        if method == "pallas":
            # Whole mixer core in one kernel: conv + SiLU + SSD scan +
            # D-skip + silu(z) gate (+ gated RMSNorm); only the in/out
            # projections (MXU-peak matmuls) stay in XLA.
            A = -jnp.exp(params["A_log"].astype(jnp.float32))
            h0 = (ssm_state.astype(jnp.float32)
                  if ssm_state is not None else None)
            gated, new_ssm_state = ssd_mixer_pallas(
                zxbcdt, A, params["conv1d"]["weight"],
                params["conv1d"].get("bias"), params["D"],
                params["dt_bias"], initial_state=h0, conv_state=conv_state,
                norm_weight=(params["norm"]["weight"] if self.rmsnorm
                             else None),
                norm_eps=self.norm_epsilon, chunk_size=self.chunk_size,
                nheads=h, hdim=p, ngroups=g, d_state=n,
            )
            if need_state and ssm_state is not None:
                new_ssm_state = new_ssm_state.astype(ssm_state.dtype)
            out = gated @ params["out_proj"]["kernel"]
            if "bias" in params["out_proj"]:
                out = out + params["out_proj"]["bias"]
            if return_state:
                raw = zxbcdt[..., self.d_inner:self.d_inner + self.conv_dim]
                new_conv_state = _conv_window(raw, conv_state, self.d_conv)
                if conv_state is not None:
                    new_conv_state = new_conv_state.astype(conv_state.dtype)
                return out, (new_conv_state, new_ssm_state)
            if return_ssm_state:
                return out, new_ssm_state
            return out

        z, xBC, dt = self._split_zxbcdt(zxbcdt)

        conv_out = causal_conv1d(
            xBC,
            params["conv1d"]["weight"],
            params["conv1d"].get("bias"),
            activation="silu",
            initial_state=conv_state,
            return_final_state=return_state,
        )
        if return_state:
            xBC, new_conv_state = conv_out
            if conv_state is not None:
                # jit-stable streaming pytree: the returned state keeps the
                # caller's dtype across chunks (same policy as Mamba-1,
                # models/mamba.py:509).
                new_conv_state = new_conv_state.astype(conv_state.dtype)
        else:
            xBC = conv_out

        x, B, C = self._split_xbc(xBC)
        seqlen = x.shape[1]
        x = x.reshape(bsz, seqlen, h, p)
        B = B.reshape(bsz, seqlen, g, n)
        C = C.reshape(bsz, seqlen, g, n)

        A = -jnp.exp(params["A_log"].astype(jnp.float32))
        h0 = ssm_state.astype(jnp.float32) if ssm_state is not None else None

        kwargs = dict(
            D=params["D"], dt_bias=params["dt_bias"], dt_softplus=True,
            initial_state=h0, return_last_state=need_state,
        )
        if method != "ref":
            ssd = ssd_chunked
            kwargs["chunk_size"] = self.chunk_size
            kwargs["method"] = method
        else:
            ssd = ssd_ref
        y = ssd(x, dt, A, B, C, **kwargs)
        if need_state:
            y, new_ssm_state = y
            if ssm_state is not None:
                new_ssm_state = new_ssm_state.astype(ssm_state.dtype)
        y = y.reshape(bsz, seqlen, self.d_inner)

        out = self._gate_and_project(params, y, z)
        if return_state:
            return out, (new_conv_state, new_ssm_state)
        if return_ssm_state:
            return out, new_ssm_state
        return out

    def _pmixer_ok(self, params: Params) -> bool:
        """Projected-mixer gate: knob on, VMEM-sized weights, and the
        reference default of bias-free projections (the kernel's dWin/dWout
        contract has no bias rows)."""
        from videomamba_tpu.ops.dispatch import ssd_pmixer_enabled
        from videomamba_tpu.ops.pallas.ssd_block import ssd_pmixer_supported

        if not ssd_pmixer_enabled():
            return False
        if "bias" in params["in_proj"] or "bias" in params["out_proj"]:
            return False
        wbytes = (
            4 if params["in_proj"]["kernel"].dtype == jnp.float32 else 2
        )
        return ssd_pmixer_supported(
            self.d_model, self.nheads, self.headdim, self.ngroups,
            self.d_state, self.chunk_size, weight_bytes_per_el=wbytes,
        )

    # --------------------------------------------------------------- decode

    def step(
        self, params: Params, hidden_states: Array, conv_state: Array,
        ssm_state: Array,
    ) -> Tuple[Array, Array, Array]:
        """Single-token decode step ((B, 1, d_model) in, like Mamba-1)."""
        if hidden_states.shape[1] != 1:
            raise ValueError("step() decodes exactly one token at a time.")
        x_tok = hidden_states[:, 0]
        zxbcdt = x_tok @ params["in_proj"]["kernel"]
        if "bias" in params["in_proj"]:
            zxbcdt = zxbcdt + params["in_proj"]["bias"]
        z, xBC, dt = self._split_zxbcdt(zxbcdt)

        xBC, new_conv_state = causal_conv1d_update(
            xBC, conv_state, params["conv1d"]["weight"],
            params["conv1d"].get("bias"),
        )
        x, B, C = self._split_xbc(xBC)
        bsz = x.shape[0]
        h, p, g, n = self.nheads, self.headdim, self.ngroups, self.d_state
        A = -jnp.exp(params["A_log"].astype(jnp.float32))
        y, new_ssm_state = ssd_state_update(
            ssm_state.astype(jnp.float32),
            x.reshape(bsz, h, p),
            dt,
            A,
            B.reshape(bsz, g, n),
            C.reshape(bsz, g, n),
            D=params["D"],
            dt_bias=params["dt_bias"],
            dt_softplus=True,
        )
        out = self._gate_and_project(
            params, y.reshape(bsz, self.d_inner)[:, None], z[:, None]
        )
        return out, new_conv_state, new_ssm_state

    def _forward_with_cache(self, params, hidden_states, inference_params):
        bsz = hidden_states.shape[0]
        conv_state, cache_ssm = self._get_states_from_cache(inference_params, bsz)
        if inference_params.seqlen_offset > 0:
            out, new_conv, new_ssm = self.step(
                params, hidden_states, conv_state, cache_ssm
            )
            assert self.layer_idx is not None
            inference_params.key_value_memory_dict[self.layer_idx] = (
                new_conv, new_ssm
            )
            return out
        out, (new_conv, new_ssm) = self(
            params, hidden_states,
            state=(jnp.zeros_like(conv_state), cache_ssm), return_state=True,
        )
        assert self.layer_idx is not None
        inference_params.key_value_memory_dict[self.layer_idx] = (new_conv, new_ssm)
        return out

    # ----------------------------------------------------------- state alloc

    def state_shapes(
        self, batch_size: int
    ) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
        """Streaming-contract shapes (consumed by streaming.expected_state_shapes)."""
        return (
            (batch_size, self.conv_dim, self.d_conv),
            (batch_size, self.nheads, self.headdim, self.d_state),
        )

    def allocate_state(
        self, batch_size: int, dtype: Optional[jnp.dtype] = None
    ) -> LayerState:
        """Zero (conv_state, ssm_state); ssm_state is always float32 (the SSD
        recurrence runs fp32 regardless of compute dtype)."""
        dtype = jnp.float32 if dtype is None else dtype
        conv_state = jnp.zeros((batch_size, self.conv_dim, self.d_conv), dtype)
        ssm_state = jnp.zeros(
            (batch_size, self.nheads, self.headdim, self.d_state), jnp.float32
        )
        return conv_state, ssm_state

    def allocate_inference_cache(
        self, batch_size: int, max_seqlen: int = 1,
        dtype: Optional[jnp.dtype] = None,
    ) -> LayerState:
        del max_seqlen
        return self.allocate_state(batch_size, dtype=dtype)

    def _get_states_from_cache(
        self, inference_params, batch_size: int, initialize_states: bool = False
    ) -> LayerState:
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
