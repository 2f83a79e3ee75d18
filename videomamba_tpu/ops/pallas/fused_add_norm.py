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


def _bwd_kernel(x_ref, res_ref, w_ref, gn_ref, gr_ref,
                dx_ref, dres_ref, dw_ref, db_ref,
                dw_scr, db_scr, *,
                norm_type: str, eps: float, has_residual: bool,
                prenorm: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dw_scr[:] = jnp.zeros_like(dw_scr)
        db_scr[:] = jnp.zeros_like(db_scr)

    x = x_ref[0].astype(jnp.float32)
    r = x + res_ref[0].astype(jnp.float32) if has_residual else x
    d = x.shape[-1]
    if norm_type == "rms":
        var = jnp.mean(jnp.square(r), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        nrm = r * inv
    else:
        mu = jnp.mean(r, axis=-1, keepdims=True)
        cen = r - mu
        var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
        inv = jax.lax.rsqrt(var + eps)
        nrm = cen * inv

    g_n = gn_ref[0].astype(jnp.float32)
    dw_scr[:] += jnp.sum(g_n * nrm, axis=0, keepdims=True)
    db_scr[:] += jnp.sum(g_n, axis=0, keepdims=True)
    dw_ref[0] = dw_scr[:]
    db_ref[0] = db_scr[:]

    dnrm = g_n * w_ref[0][None, :]
    if norm_type == "rms":
        dot = jnp.sum(dnrm * r, axis=-1, keepdims=True)
        dr = dnrm * inv - r * (inv ** 3) * (dot / d)
    else:
        dot = jnp.sum(dnrm * cen, axis=-1, keepdims=True)
        dcen = dnrm * inv - cen * (inv ** 3) * (dot / d)
        dr = dcen - jnp.mean(dcen, axis=-1, keepdims=True)
    if prenorm:
        dr = dr + gr_ref[0].astype(jnp.float32)
    dx_ref[0] = dr.astype(dx_ref.dtype)
    dres_ref[0] = dr.astype(dres_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("norm_type", "eps", "prenorm", "has_residual",
                     "block_rows", "interpret"),
)
def fused_add_norm_bwd_pallas(
    x: Array,
    weight: Array,
    residual: Optional[Array],
    g_out: Array,
    g_resout: Optional[Array],
    prenorm: bool = False,
    has_residual: bool = False,
    eps: float = 1e-5,
    norm_type: str = "rms",
    block_rows: int = DEFAULT_BLOCK_ROWS,
    interpret: bool = False,
):
    """One-pass backward of the fused add-norm.

    Returns (dx, dweight, dbias, dresidual) where dresidual carries the
    same values as dx (the add is gradient-transparent); the caller drops
    it when there was no residual input. dbias is the raw g_out row-sum
    (None-handling is the caller's).
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    orig_shape = x.shape
    d = orig_shape[-1]
    m = 1
    for s in orig_shape[:-1]:
        m *= s
    x2 = x.reshape(m, d)
    res2 = residual.reshape(m, d) if has_residual else x2
    gn2 = g_out.reshape(m, d)
    gr2 = (g_resout.reshape(m, d) if (prenorm and g_resout is not None)
           else jnp.zeros((m, d), jnp.float32))
    w2 = weight.astype(jnp.float32)

    rows = min(block_rows, max(8, m))
    rows = ((rows + 7) // 8) * 8
    pad = (-m) % rows
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))
        res2 = jnp.pad(res2, ((0, pad), (0, 0))) if has_residual else x2
        gn2 = jnp.pad(gn2, ((0, pad), (0, 0)))
        gr2 = jnp.pad(gr2, ((0, pad), (0, 0)))
    mp = m + pad

    res_dtype = residual.dtype if has_residual else x.dtype
    kernel = functools.partial(
        _bwd_kernel, norm_type=norm_type, eps=eps,
        has_residual=has_residual, prenorm=prenorm,
    )
    dx, dres, dw, db = pl.pallas_call(
        kernel,
        grid=(mp // rows,),
        in_specs=[
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, d), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, mp, d), x.dtype),
            jax.ShapeDtypeStruct((1, mp, d), res_dtype),
            jax.ShapeDtypeStruct((1, 1, d), jnp.float32),
            jax.ShapeDtypeStruct((1, 1, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, d), jnp.float32),
            pltpu.VMEM((1, d), jnp.float32),
        ],
        interpret=interpret,
    )(x2[None], res2[None], w2[None], gn2[None], gr2[None])

    dx = dx[0, :m].reshape(orig_shape)
    dres = dres[0, :m].reshape(orig_shape) if has_residual else None
    return dx, dw[0, 0], db[0, 0], dres
