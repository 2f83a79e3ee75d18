"""Prenorm residual Block: Add -> Norm -> Mixer.

Structural twin of the reference ``Block``
(/root/reference/models/videomamba/videomamba.py:87-253): the block takes
(hidden, residual), adds them, normalizes, runs the mixer, and returns the
mixer output together with the post-add residual — the layout that lets the
add and the norm fuse into one kernel. ``fused_add_norm`` selects the fused
implementation (one Pallas/VPU pass) vs. the two-step composition; both are
numerically identical here because the unfused path also computes in float32.

Activation recomputation (the reference's torch.utils.checkpoint wrapping,
videomamba.py:168-206) maps to ``jax.checkpoint`` applied by the caller
around :meth:`Block.__call__` — see PretrainVideoMamba ``checkpoint_num``.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from videomamba_tpu.models.mamba import Mamba
from videomamba_tpu.ops.norm import fused_add_norm, layer_norm, rms_norm

Array = jax.Array
Params = Dict[str, Any]
LayerState = Tuple[Array, Array]


def _block_recompute(hidden, residual, norm_w, norm_b, win, wout, conv_w,
                     conv_b, wx, wdt, dt_bias, A, D, h0, conv_state,
                     norm_rms, eps, residual_fp32):
    """XLA recomputation of the block-fused kernel, numerics-matched.

    Calls the custom-vjp'd Pallas scan for the recurrence, so differentiating
    THIS function (the block-fused backward rule) uses the Pallas gradient
    kernel for the scan and plain XLA transposes for everything else.
    """
    from videomamba_tpu.ops.causal_conv1d import causal_conv1d
    from videomamba_tpu.ops.selective_scan import _pallas_fused_scan

    res_out = hidden.astype(jnp.float32) + residual.astype(jnp.float32)
    if norm_rms:
        normed = rms_norm(res_out, norm_w, eps=eps)
    else:
        normed = layer_norm(res_out, norm_w, norm_b, eps=eps)
    highest = win.dtype == jnp.float32
    mm0 = normed if highest else normed.astype(win.dtype)
    xz = jnp.dot(mm0, win.astype(mm0.dtype),
                 precision=jax.lax.Precision.HIGHEST if highest else None,
                 preferred_element_type=jnp.float32)
    d_inner = win.shape[1] // 2
    x = xz[:, :, :d_inner]
    z = xz[:, :, d_inner:]
    conv_out = causal_conv1d(
        x, conv_w, conv_b, activation="silu", initial_state=conv_state
    )
    r, n = wdt.shape[0], A.shape[1]
    mm1 = conv_out if highest else conv_out.astype(wx.dtype)
    xdbl = jnp.dot(mm1, wx.astype(mm1.dtype),
                   precision=jax.lax.Precision.HIGHEST if highest else None,
                   preferred_element_type=jnp.float32)
    dt_mm = xdbl[..., :r] if highest else xdbl[..., :r].astype(wdt.dtype)
    delta_raw = jnp.dot(dt_mm, wdt.astype(dt_mm.dtype),
                        precision=jax.lax.Precision.HIGHEST if highest else None,
                        preferred_element_type=jnp.float32)
    y_scan, h_last = _pallas_fused_scan(
        conv_out, delta_raw, A, xdbl[..., r:r + n], xdbl[..., r + n:],
        D, z, dt_bias, h0, True,
    )
    mm2 = y_scan if highest else y_scan.astype(wout.dtype)
    out = jnp.dot(mm2, wout.astype(mm2.dtype),
                  precision=jax.lax.Precision.HIGHEST if highest else None,
                  preferred_element_type=jnp.float32)
    res_dtype = jnp.float32 if residual_fp32 else hidden.dtype
    return (out.astype(hidden.dtype), res_out.astype(res_dtype), h_last)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17))
def _block_fused(hidden, residual, norm_w, norm_b, win, wout, conv_w, conv_b,
                 wx, wdt, dt_bias, A, D, h0, conv_state,
                 norm_rms, eps, residual_fp32):
    """Whole-block fused forward (Pallas); see ops/pallas/block_fused."""
    from videomamba_tpu.ops.pallas.block_fused import block_fused_pallas
    from videomamba_tpu.ops.pallas.mixer_fused import pack_weights

    r, n = wdt.shape[0], A.shape[1]
    wx_pack, wdt_pack = pack_weights(wx, wdt, r, n)
    return block_fused_pallas(
        hidden, residual, norm_w, norm_b, win, wout, conv_w, conv_b,
        wx_pack, wdt_pack, A, D, dt_bias, h0, conv_state,
        norm_rms=norm_rms, eps=eps, residual_fp32=residual_fp32,
        highest=(win.dtype == jnp.float32),
    )


def _block_bwd_backend() -> str:
    """"fused" (whole-block mega-kernel, default) or "composite" (XLA
    recompute + Pallas scan backward) via VIDEOMAMBA_BLOCK_BWD."""
    import os

    forced = os.getenv("VIDEOMAMBA_BLOCK_BWD", "").strip().lower()
    if forced in {"fused", "composite"}:
        return forced
    return "fused"


def _block_bwd_training_opt_in() -> bool:
    """Route non-deterministic (training) calls through the fused block
    only on explicit request — see the gate comment in Block.__call__."""
    import os

    return os.getenv("VIDEOMAMBA_BLOCK_BWD", "").strip().lower() == "fused"


def _block_fused_fwd(hidden, residual, norm_w, norm_b, win, wout, conv_w,
                     conv_b, wx, wdt, dt_bias, A, D, h0, conv_state,
                     norm_rms, eps, residual_fp32):
    from videomamba_tpu.ops.pallas.block_fused import block_fused_pallas
    from videomamba_tpu.ops.pallas.mixer_fused import pack_weights

    r, n = wdt.shape[0], A.shape[1]
    wx_pack, wdt_pack = pack_weights(wx, wdt, r, n)
    out, res_out, h_last, hckpt = block_fused_pallas(
        hidden, residual, norm_w, norm_b, win, wout, conv_w, conv_b,
        wx_pack, wdt_pack, A, D, dt_bias, h0, conv_state,
        norm_rms=norm_rms, eps=eps, residual_fp32=residual_fp32,
        highest=(win.dtype == jnp.float32), checkpoints=True,
    )
    res = (hidden, residual, norm_w, norm_b, win, wout, conv_w, conv_b,
           wx, wdt, dt_bias, A, D, h0, conv_state, hckpt)
    return (out, res_out, h_last), res


def _block_fused_bwd(norm_rms, eps, residual_fp32, res, cts):
    (hidden, residual, norm_w, norm_b, win, wout, conv_w, conv_b,
     wx, wdt, dt_bias, A, D, h0, conv_state, hckpt) = res

    if _block_bwd_backend() == "fused":
        # Whole-block mega-kernel backward (ops/pallas/block_bwd): one
        # pallas_call per layer, residuals = (res_out recomputed by one add,
        # the forward's scan checkpoints).
        from videomamba_tpu.ops.pallas.block_bwd import block_bwd_pallas
        from videomamba_tpu.ops.pallas.mixer_fused import (
            PACK,
            pack_weights,
        )

        g_out, g_res, g_hlast = cts
        r, n = wdt.shape[0], A.shape[1]
        # Recompute res_out in f32 regardless of residual_fp32: the forward
        # kernel normalizes the UNROUNDED f32 sum (block_fused.py kernel)
        # before casting res_out to its storage dtype, so the backward must
        # linearize at the same f32 point — recomputing the norm from a
        # bf16-rounded res_out would perturb every gradient slightly.
        res_out = hidden.astype(jnp.float32) + residual.astype(jnp.float32)
        wx_pack, wdt_pack = pack_weights(wx, wdt, r, n)
        (dres, dnw, dnb, dwin, dwout, dcw, dcb, dwxp, dwdtp, dbias_g,
         dA, dD, dh0, dcst) = block_bwd_pallas(
            res_out, norm_w, norm_b, win, wout, conv_w, conv_b,
            wx_pack, wdt_pack, A, D, dt_bias, conv_state, hckpt,
            g_out, g_res, g_hlast,
            norm_rms=norm_rms, eps=eps,
            highest=(win.dtype == jnp.float32),
        )
        dwx = jnp.concatenate(
            [dwxp[:, :r], dwxp[:, PACK:PACK + n],
             dwxp[:, 2 * PACK:2 * PACK + n]], axis=1,
        )
        return (
            dres.astype(hidden.dtype),
            dres.astype(residual.dtype),
            dnw.astype(norm_w.dtype),
            dnb.astype(norm_b.dtype) if norm_b is not None else None,
            dwin.astype(win.dtype),
            dwout.astype(wout.dtype),
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

    args = res[:-1]  # drop hckpt: the recompute path regenerates everything
    present = [a is not None for a in args]
    packed = tuple(a for a in args if a is not None)

    def f(*p):
        it = iter(p)
        full = [next(it) if flag else None for flag in present]
        return _block_recompute(*full, norm_rms, eps, residual_fp32)

    _, vjp = jax.vjp(f, *packed)
    grads = iter(vjp(cts))
    return tuple(next(grads) if flag else None for flag in present)


_block_fused.defvjp(_block_fused_fwd, _block_fused_bwd)


def drop_path(key: Optional[Array], x: Array, rate: float, deterministic: bool) -> Array:
    """Stochastic depth (timm DropPath semantics, scale_by_keep=True)."""
    if deterministic or rate == 0.0:
        return x
    if key is None:
        raise ValueError("drop_path with rate > 0 in training mode needs a PRNG key.")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * (mask.astype(x.dtype) / keep)


@dataclasses.dataclass(frozen=True)
class Block:
    """Add -> Norm -> Mamba block with carried residual and streaming state."""

    dim: int
    mixer: Mamba
    norm_type: str = "layer"  # "layer" | "rms"
    norm_epsilon: float = 1e-5
    fused_add_norm: bool = False
    residual_in_fp32: bool = False
    drop_path_rate: float = 0.0
    layer_idx: Optional[int] = None

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        k_mixer, _ = jax.random.split(key)
        norm: Params = {"weight": jnp.ones((self.dim,), jnp.float32)}
        if self.norm_type == "layer":
            norm["bias"] = jnp.zeros((self.dim,), jnp.float32)
        return {"mixer": self.mixer.init(k_mixer, dtype=dtype), "norm": norm}

    def __call__(
        self,
        params: Params,
        hidden_states: Array,
        residual: Optional[Array] = None,
        state: Optional[LayerState] = None,
        return_state: bool = False,
        ssm_state: Optional[Array] = None,
        return_ssm_state: bool = False,
        drop_path_key: Optional[Array] = None,
        deterministic: bool = True,
        inference_params=None,
    ) -> Union[Tuple[Array, Array], Tuple[Array, Array, LayerState]]:
        """Returns (hidden, residual) or (hidden, residual, new_state).

        Matches the reference forward contract (videomamba.py:121-246):
        ``residual`` is the running pre-norm sum; drop-path is applied to the
        incoming hidden states only when a residual exists (never on the
        first block's raw embedding). ``return_ssm_state`` (with a bare
        ``ssm_state``) additionally returns the advanced SSM array — the
        functional stand-in for the reference's in-place
        ``ssm_state.copy_(last_state)`` (mamba_simple.py:419-439).
        """
        if state is not None and ssm_state is not None:
            raise ValueError("Pass either state or ssm_state, not both.")
        if return_ssm_state and ssm_state is None:
            raise ValueError("return_ssm_state requires ssm_state.")

        # Whole-block fusion always engages for inference; for training it
        # is opt-in (VIDEOMAMBA_BLOCK_BWD=fused) — the block-level
        # mega-backward (ops/pallas/block_bwd) measured 88.9 ms vs 83.5 ms
        # for the mixer-level path at Base on v5e, so the default training
        # route stays mixer-fused. When the fused block IS differentiated
        # (opt-in, or grads through a deterministic call), its backward is
        # the mega-kernel unless VIDEOMAMBA_BLOCK_BWD=composite.
        if inference_params is None and self._use_block_fused(params) and (
            deterministic or _block_bwd_training_opt_in()
        ):
            return self._call_block_fused(
                params, hidden_states, residual, state, return_state,
                ssm_state, return_ssm_state, drop_path_key, deterministic,
            )

        dropped = (
            drop_path(drop_path_key, hidden_states, self.drop_path_rate, deterministic)
            if residual is not None
            else hidden_states
        )
        normed, new_residual = fused_add_norm(
            dropped,
            params["norm"]["weight"],
            params["norm"].get("bias"),
            residual=residual,
            prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_epsilon,
            norm_type=self.norm_type,
            use_pallas=self.fused_add_norm,
        )

        if state is not None:
            mixer_out = self.mixer(
                params["mixer"], normed, state=state, return_state=return_state
            )
            if return_state:
                hidden, new_state = mixer_out
                return hidden, new_residual, new_state
            return mixer_out, new_residual

        mixer_out = self.mixer(
            params["mixer"], normed, ssm_state=ssm_state,
            return_ssm_state=return_ssm_state,
            inference_params=inference_params,
        )
        if return_ssm_state:
            hidden, new_ssm = mixer_out
            return hidden, new_residual, new_ssm
        return mixer_out, new_residual

    def _use_block_fused(self, params: Params) -> bool:
        """Whole-block fusion gate: fused norms + fast-path mixer + no
        in/out-proj biases (the reference default) + VMEM-sized weights."""
        if not getattr(self.mixer, "supports_block_fusion", True):
            return False  # e.g. Mamba2: the SSD path is already MXU-native
        if not (self.fused_add_norm and self.mixer.use_fast_path):
            return False
        if self.mixer.sp_axis is not None:
            return False  # sequence-parallel route owns the mixer call
        if self.mixer.scan_method != "pallas":
            return False
        mx = params["mixer"]
        if (
            "bias" in mx["in_proj"]
            or "bias" in mx["out_proj"]
            or "bias" not in mx["conv1d"]
        ):
            return False
        from videomamba_tpu.ops.pallas.block_fused import block_fused_supported

        wbytes = 4 if mx["in_proj"]["kernel"].dtype == jnp.float32 else 2
        return block_fused_supported(
            self.dim, self.mixer.d_inner, self.mixer.dt_rank_,
            self.mixer.d_state, weight_bytes_per_el=wbytes,
        )

    def _call_block_fused(
        self, params, hidden_states, residual, state, return_state,
        ssm_state, return_ssm_state, drop_path_key, deterministic,
    ):
        mx = params["mixer"]
        bsz = hidden_states.shape[0]
        mixer = self.mixer

        conv_state = None
        if state is not None:
            conv_state, ssm_state = state
        h0 = (
            ssm_state
            if ssm_state is not None
            else jnp.zeros((bsz, mixer.d_inner, mixer.d_state), jnp.float32)
        )
        cstate_in = (
            conv_state
            if conv_state is not None
            else jnp.zeros(
                (bsz, mixer.d_inner, mixer.d_conv), hidden_states.dtype
            )
        )
        dropped = (
            drop_path(drop_path_key, hidden_states, self.drop_path_rate,
                      deterministic)
            if residual is not None
            else hidden_states
        )
        res_in = (
            residual
            if residual is not None
            else jnp.zeros_like(hidden_states, dtype=jnp.float32)
        )
        A = -jnp.exp(mx["A_log"].astype(jnp.float32))
        out, res_out, h_last = _block_fused(
            dropped, res_in,
            params["norm"]["weight"], params["norm"].get("bias"),
            mx["in_proj"]["kernel"], mx["out_proj"]["kernel"],
            mx["conv1d"]["weight"], mx["conv1d"]["bias"],
            mx["x_proj"]["kernel"], mx["dt_proj"]["kernel"],
            mx["dt_proj"]["bias"].astype(jnp.float32),
            A, mx["D"].astype(jnp.float32), h0, cstate_in,
            self.norm_type == "rms", self.norm_epsilon,
            self.residual_in_fp32,
        )
        if return_ssm_state:
            assert ssm_state is not None
            return out, res_out, h_last.astype(ssm_state.dtype)
        if state is None or not return_state:
            return out, res_out
        # New conv window: recompute the conv-input x for the last W
        # positions only (one tiny norm + matmul; the kernel never
        # materializes x in HBM).
        new_conv = self._tail_conv_window(params, res_out, conv_state)
        if conv_state is not None:
            new_conv = new_conv.astype(conv_state.dtype)
        new_ssm = (
            h_last.astype(ssm_state.dtype) if ssm_state is not None else h_last
        )
        return out, res_out, (new_conv, new_ssm)

    def _tail_conv_window(self, params, res_out, conv_state):
        from videomamba_tpu.models.mamba import _conv_window

        mx = params["mixer"]
        w = self.mixer.d_conv
        tail = res_out[:, -w:].astype(jnp.float32)
        if self.norm_type == "rms":
            normed = rms_norm(tail, params["norm"]["weight"],
                              eps=self.norm_epsilon)
        else:
            normed = layer_norm(tail, params["norm"]["weight"],
                                params["norm"].get("bias"),
                                eps=self.norm_epsilon)
        win = mx["in_proj"]["kernel"]
        highest = win.dtype == jnp.float32
        mm = normed if highest else normed.astype(win.dtype)
        x_tail = jnp.dot(
            mm, win[:, :self.mixer.d_inner].astype(mm.dtype),
            precision=jax.lax.Precision.HIGHEST if highest else None,
            preferred_element_type=jnp.float32,
        )
        return _conv_window(x_tail, conv_state, w)

    def allocate_state(self, batch_size: int, dtype=None) -> LayerState:
        return self.mixer.allocate_state(batch_size, dtype=dtype)

    def allocate_inference_cache(self, batch_size: int, max_seqlen: int = 1, dtype=None):
        return self.mixer.allocate_inference_cache(batch_size, max_seqlen, dtype=dtype)


def create_block(
    d_model: int,
    ssm_cfg: Optional[Dict[str, object]] = None,
    norm_epsilon: float = 1e-5,
    drop_path: float = 0.0,
    rms_norm: bool = True,
    residual_in_fp32: bool = True,
    fused_add_norm: bool = True,
    layer_idx: Optional[int] = None,
    bimamba: bool = True,
) -> Block:
    """Block factory (videomamba.py:256-291). Like the reference, the inner
    mixer is always unidirectional (``bimamba=False`` forced on the Mamba);
    bidirectionality is composed externally.

    ``ssm_cfg={"layer": "Mamba2", ...}`` selects the SSD mixer
    (models/mamba2.py) — the mamba_ssm ``ssm_cfg`` layer-key convention. No
    reference counterpart (the reference is Mamba-1 only); see the mamba2
    module docstring for why it exists."""
    del bimamba  # accepted for config parity; mixer below is unidirectional
    ssm_cfg = dict(ssm_cfg or {})
    ssm_cfg.pop("bimamba", None)
    layer_kind = str(ssm_cfg.pop("layer", "Mamba"))
    if layer_kind == "Mamba2":
        from videomamba_tpu.models.mamba2 import Mamba2

        mixer = Mamba2(d_model=d_model, layer_idx=layer_idx, **ssm_cfg)
    elif layer_kind == "Mamba":
        mixer = Mamba(d_model=d_model, layer_idx=layer_idx, bimamba=False, **ssm_cfg)
    else:
        raise ValueError(f"unknown ssm_cfg layer {layer_kind!r}")
    return Block(
        dim=d_model,
        mixer=mixer,
        norm_type="rms" if rms_norm else "layer",
        norm_epsilon=norm_epsilon,
        fused_add_norm=fused_add_norm,
        residual_in_fp32=residual_in_fp32,
        drop_path_rate=drop_path,
        layer_idx=layer_idx,
    )
