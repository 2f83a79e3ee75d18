"""Pallas fused residual-add + (RMS|Layer)Norm kernel.

TPU-native equivalent of mamba-ssm's Triton ``layer_norm_fn``/``rms_norm_fn``
(reference videomamba.py:151-166,902-918): one VMEM pass computes
``residual_out = x + residual`` and the normalized output, with float32
statistics over the feature (lane) axis. Grid walks row blocks; the feature
dimension must be lane-aligned (multiple of 128) — other shapes use the XLA
composition in ops/norm.py, which is numerically identical.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

DEFAULT_BLOCK_ROWS = 256


def fused_add_norm_supported(d: int) -> bool:
    return d % 128 == 0


def _kernel(x_ref, res_ref, w_ref, b_ref, out_ref, resout_ref, *,
            norm_type: str, eps: float, has_residual: bool, has_bias: bool,
            prenorm: bool):
    x = x_ref[0].astype(jnp.float32)
    if has_residual:
        res = x + res_ref[0].astype(jnp.float32)
    else:
        res = x
    if norm_type == "rms":
        var = jnp.mean(jnp.square(res), axis=-1, keepdims=True)
        normed = res * jax.lax.rsqrt(var + eps)
    else:
        mean = jnp.mean(res, axis=-1, keepdims=True)
        centered = res - mean
        var = jnp.mean(jnp.square(centered), axis=-1, keepdims=True)
        normed = centered * jax.lax.rsqrt(var + eps)
    normed = normed * w_ref[0][None, :]
    if has_bias:
        normed = normed + b_ref[0][None, :]
    out_ref[0] = normed.astype(out_ref.dtype)
    if prenorm:
        resout_ref[0] = res.astype(resout_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("norm_type", "eps", "prenorm", "residual_in_fp32",
                     "block_rows", "interpret"),
)
def fused_add_norm_pallas(
    x: Array,                      # (B, L, D) or (M, D)
    weight: Array,                 # (D,)
    bias: Optional[Array] = None,  # (D,)
    residual: Optional[Array] = None,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    eps: float = 1e-5,
    norm_type: str = "rms",
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
):
    """Returns normed or (normed, residual_out) — same contract as
    ops.norm.fused_add_norm."""
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True

    orig_shape = x.shape
    d = orig_shape[-1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    x2 = x.reshape(m, d)
    has_residual = residual is not None
    res2 = residual.reshape(m, d) if has_residual else x2
    has_bias = bias is not None
    b2 = (bias if has_bias else jnp.zeros((d,), jnp.float32)).astype(jnp.float32)
    w2 = weight.astype(jnp.float32)

    rows = min(block_rows, max(8, m))
    rows = ((rows + 7) // 8) * 8
    pad = (-m) % rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        res2 = jnp.pad(res2, ((0, pad), (0, 0))) if has_residual else x2
    mp = m + pad

    res_dtype = jnp.float32 if residual_in_fp32 else x.dtype
    kernel = functools.partial(
        _kernel, norm_type=norm_type, eps=eps, has_residual=has_residual,
        has_bias=has_bias, prenorm=prenorm,
    )
    out, res_out = pl.pallas_call(
        kernel,
        grid=(mp // rows,),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp, d), x.dtype),
            jax.ShapeDtypeStruct((1, mp, d), res_dtype),
        ],
        interpret=interpret,
    )(x2[None], res2[None], w2[None], b2[None])

    out = out[0, :m].reshape(orig_shape)
    if not prenorm:
        return out
    res_out = res_out[0, :m].reshape(orig_shape)
    return out, res_out
