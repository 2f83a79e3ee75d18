"""Fused residual-add + (RMS|Layer)Norm — TPU-native.

Functional equivalent of mamba-ssm's Triton ``layer_norm_fn`` /
``rms_norm_fn`` that the reference Block depends on
(/root/reference/models/videomamba/videomamba.py:11,151-166,902-918):

    prenorm=True:  residual_out = x + residual;  return (norm(residual_out), residual_out)
    prenorm=False: return norm(x + residual)

Norm statistics are computed in float32; the normalized output is returned in
the input dtype; ``residual_out`` is float32 when ``residual_in_fp32`` else
input dtype. On TPU these are pure VPU ops that XLA fuses with neighbors; a
Pallas fast-path kernel (ops/pallas/fused_add_norm.py) plugs in behind the
same signature.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7))
def _fused_add_norm_pallas_vjp(x, weight, bias, residual,
                               prenorm, residual_in_fp32, eps, norm_type):
    """Pallas forward / XLA-recompute backward for the fused add-norm."""
    from videomamba_tpu.ops.pallas.fused_add_norm import fused_add_norm_pallas

    return fused_add_norm_pallas(
        x, weight, bias, residual=residual, prenorm=prenorm,
        residual_in_fp32=residual_in_fp32, eps=eps, norm_type=norm_type,
    )


def _fan_fwd(x, weight, bias, residual, prenorm, residual_in_fp32, eps, norm_type):
    out = _fused_add_norm_pallas_vjp(
        x, weight, bias, residual, prenorm, residual_in_fp32, eps, norm_type
    )
    return out, (x, weight, bias, residual)


def _fan_bwd(prenorm, residual_in_fp32, eps, norm_type, residuals, cts):
    x, weight, bias, residual = residuals

    from videomamba_tpu.ops.pallas.fused_add_norm import (
        fused_add_norm_bwd_pallas,
        fused_add_norm_supported,
    )

    import os

    use_pallas_bwd = (
        os.getenv("VIDEOMAMBA_NORM_BWD", "").strip().lower() == "pallas"
    )
    if use_pallas_bwd and fused_add_norm_supported(x.shape[-1]):
        # One-pass Pallas backward — OPT-IN (VIDEOMAMBA_NORM_BWD=pallas).
        # Measured on v5e at Base train shapes: the XLA-recompute VJP wins
        # by ~1.6 ms/step because XLA fuses the norm backward into adjacent
        # elementwise work, while a separate kernel breaks that fusion.
        # Kept for shapes/backends where a one-pass bwd may win.
        if prenorm:
            g_n, g_r = cts
        else:
            g_n, g_r = cts, None
        dx, dw, db, dres = fused_add_norm_bwd_pallas(
            x, weight, residual, g_n, g_r,
            prenorm=prenorm, has_residual=residual is not None,
            eps=eps, norm_type=norm_type,
        )
        return (
            dx,
            dw.astype(weight.dtype),
            db.astype(bias.dtype) if bias is not None else None,
            dres,
        )

    args = (x, weight, bias, residual)
    present = [a is not None for a in args]
    packed = tuple(a for a in args if a is not None)

    def f(*p):
        it = iter(p)
        full = [next(it) if flag else None for flag in present]
        return fused_add_norm(
            full[0], full[1], full[2], residual=full[3], prenorm=prenorm,
            residual_in_fp32=residual_in_fp32, eps=eps, norm_type=norm_type,
            use_pallas=False,
        )

    _, vjp = jax.vjp(f, *packed)
    grads = iter(vjp(cts))
    return tuple(next(grads) if flag else None for flag in present)


_fused_add_norm_pallas_vjp.defvjp(_fan_fwd, _fan_bwd)


def rms_norm(x: Array, weight: Array, eps: float = 1e-5) -> Array:
    """RMSNorm over the last axis, float32 internals, output in x.dtype."""
    x32 = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
    y = x32 * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(x.dtype)


def layer_norm(
    x: Array, weight: Array, bias: Optional[Array] = None, eps: float = 1e-5
) -> Array:
    """LayerNorm over the last axis, float32 internals, output in x.dtype."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def fused_add_norm(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    residual: Optional[Array] = None,
    prenorm: bool = False,
    residual_in_fp32: bool = False,
    eps: float = 1e-5,
    norm_type: str = "rms",
    use_pallas: bool = False,
) -> Union[Array, Tuple[Array, Array]]:
    """Residual-add followed by normalization, in one logical op.

    Args:
        x: (..., D) input (e.g. a mixer output).
        weight: (D,) norm scale.
        bias: (D,) norm shift (LayerNorm) or None (RMSNorm).
        residual: (..., D) running residual or None (first block).
        prenorm: if True, also return the post-add residual.
        residual_in_fp32: keep the returned residual in float32.
        eps: norm epsilon.
        norm_type: "rms" or "layer".
        use_pallas: take the Pallas fused kernel when available (TPU and
            lane-aligned feature dim); falls back to the identical XLA
            composition otherwise. This is the ``fused_add_norm`` model flag.

    Returns:
        normed, or (normed, residual_out) when prenorm=True.
    """
    if use_pallas:
        from videomamba_tpu.ops import dispatch
        from videomamba_tpu.ops.pallas.fused_add_norm import (
            fused_add_norm_supported,
        )

        if (dispatch.on_tpu() or dispatch.interpret_mode()) and (
            fused_add_norm_supported(x.shape[-1])
        ):
            return _fused_add_norm_pallas_vjp(
                x, weight, bias, residual,
                prenorm, residual_in_fp32, eps, norm_type,
            )

    if residual is not None:
        residual_out = x.astype(jnp.float32) + residual.astype(jnp.float32)
    else:
        residual_out = x.astype(jnp.float32)

    if norm_type == "rms":
        normed = rms_norm(residual_out, weight, eps=eps)
    elif norm_type == "layer":
        normed = layer_norm(residual_out, weight, bias, eps=eps)
    else:
        raise ValueError(f"Unknown norm_type: {norm_type!r}")
    normed = normed.astype(x.dtype)

    if not prenorm:
        return normed
    if not residual_in_fp32:
        residual_out = residual_out.astype(x.dtype)
    return normed, residual_out
