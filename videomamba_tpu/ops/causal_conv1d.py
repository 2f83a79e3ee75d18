"""Causal depthwise 1-D convolution with streaming state — TPU-native.

Functional equivalent of the CUDA ``causal_conv1d`` package the reference
depends on (/root/reference/models/videomamba/mamba_simple.py:11,381-404,
468-474), rebuilt for XLA: the kernel width is tiny (typically 4), so the
convolution is expressed as W shifted multiply-adds that XLA fuses into one
VPU pass; no conv layout plumbing, no im2col.

Layout: activations are (B, L, D) with channels minor (TPU lane dimension);
weights are (W, D). The streaming ``conv_state`` follows the frozen contract
layout (B, D, W) — it stores the last W *raw* (pre-activation) inputs, exactly
like the reference (mamba_simple.py:381-404).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _pallas_conv(x, weight, bias, initial_state, activation):
    from videomamba_tpu.ops.pallas.causal_conv import causal_conv1d_pallas

    return causal_conv1d_pallas(
        x, weight, bias, initial_state, activation=activation
    )


def _pallas_conv_fwd(x, weight, bias, initial_state, activation):
    out = _pallas_conv(x, weight, bias, initial_state, activation)
    return out, (x, weight, bias, initial_state)


def _pallas_conv_bwd(activation, residuals, ct):
    x, weight, bias, initial_state = residuals
    args = (x, weight, bias, initial_state)
    present = [a is not None for a in args]
    packed = tuple(a for a in args if a is not None)

    def f(*p):
        it = iter(p)
        full = [next(it) if flag else None for flag in present]
        return causal_conv1d(
            full[0], full[1], full[2], activation=activation,
            initial_state=full[3], use_pallas=False,
        )

    _, vjp = jax.vjp(f, *packed)
    grads = iter(vjp(ct))
    return tuple(next(grads) if flag else None for flag in present)


_pallas_conv.defvjp(_pallas_conv_fwd, _pallas_conv_bwd)


def causal_conv1d(
    x: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
    initial_state: Optional[Array] = None,
    return_final_state: bool = False,
    use_pallas: bool = False,
) -> Union[Array, Tuple[Array, Array]]:
    """Causal depthwise conv along the time axis, with optional carried state.

    ``y[b, l, d] = act(bias[d] + sum_w weight[w, d] * ctx[b, l + w, d])`` where
    ``ctx`` is x left-extended with the last W-1 entries of ``initial_state``
    (or zeros). Mirrors ``causal_conv1d_fn`` batch semantics plus the
    reference's streaming concat trick (mamba_simple.py:381-392).

    Args:
        x: (B, L, D) input.
        weight: (W, D) depthwise taps, tap 0 oldest.
        bias: (D,) or None.
        activation: "silu"/"swish" or None.
        initial_state: (B, D, W) carried raw-input window or None (zeros).
        return_final_state: also return the updated (B, D, W) window, which
            holds the last W raw inputs of the extended sequence.

    Returns:
        y (B, L, D) in x.dtype, or (y, new_state (B, D, W) in x.dtype).
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError(f"activation {activation!r} is not supported")
    bsz, seqlen, d = x.shape
    w = weight.shape[0]
    dtype_in = x.dtype

    if use_pallas:
        from videomamba_tpu.ops import dispatch
        from videomamba_tpu.ops.pallas.causal_conv import pallas_conv_supported

        if (dispatch.on_tpu() or dispatch.interpret_mode()) and (
            pallas_conv_supported(d, seqlen, w)
        ):
            state_in = (
                initial_state
                if initial_state is not None
                else jnp.zeros((bsz, d, w), x.dtype)
            )
            y = _pallas_conv(x, weight, bias, state_in, activation)
            if not return_final_state:
                return y
            full = jnp.concatenate(
                [state_in.swapaxes(1, 2).astype(dtype_in), x], axis=1
            )
            if initial_state is None:
                # Fresh-state semantics: zero-pad, not the dummy zeros window
                # (identical values here, but keep dtype/len rules uniform).
                full = jnp.pad(x, ((0, 0), (w, 0), (0, 0)))
            return y, full[:, -w:].swapaxes(1, 2)

    x32 = x.astype(jnp.float32)
    if initial_state is not None:
        state_bld = initial_state.astype(jnp.float32).swapaxes(1, 2)  # (B, W, D)
        ctx = jnp.concatenate([state_bld[:, -(w - 1):], x32], axis=1) if w > 1 else x32
    else:
        ctx = jnp.pad(x32, ((0, 0), (w - 1, 0), (0, 0))) if w > 1 else x32

    w32 = weight.astype(jnp.float32)
    y = w32[0][None, None, :] * ctx[:, 0:seqlen]
    for k in range(1, w):
        y = y + w32[k][None, None, :] * ctx[:, k:k + seqlen]
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, None, :]
    if activation in ("silu", "swish"):
        y = y * jax.nn.sigmoid(y)
    y = y.astype(dtype_in)

    if not return_final_state:
        return y

    # New state = last W raw inputs of [state || x] (zero-padded when short),
    # matching x_cat[..., -d_conv:] / F.pad(x, (W - L, 0)) in the reference.
    if initial_state is not None:
        full = jnp.concatenate([initial_state.swapaxes(1, 2).astype(dtype_in), x], axis=1)
    else:
        full = jnp.pad(x, ((0, 0), (w, 0), (0, 0)))
    new_state = full[:, -w:].swapaxes(1, 2)  # (B, D, W)
    return y, new_state


def causal_conv1d_update(
    x: Array,
    conv_state: Array,
    weight: Array,
    bias: Optional[Array] = None,
    activation: Optional[str] = "silu",
) -> Tuple[Array, Array]:
    """Single-token rolling-buffer conv step (decode path).

    Functional twin of the in-place CUDA ``causal_conv1d_update``
    (mamba_simple.py:468-474): rolls the (B, D, W) window left by one, appends
    the new token, and convolves the window.

    Args:
        x: (B, D) current-token input.
        conv_state: (B, D, W) raw-input window.
        weight: (W, D); bias: (D,) or None.

    Returns:
        (y (B, D) in x.dtype, new_conv_state (B, D, W) in conv_state.dtype).
    """
    if activation not in (None, "silu", "swish"):
        raise NotImplementedError(f"activation {activation!r} is not supported")
    new_state = jnp.concatenate(
        [conv_state[:, :, 1:], x.astype(conv_state.dtype)[:, :, None]], axis=2
    )
    y = jnp.einsum(
        "bdw,wd->bd", new_state.astype(jnp.float32), weight.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)[None, :]
    if activation in ("silu", "swish"):
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype), new_state
