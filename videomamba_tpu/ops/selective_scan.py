"""Selective-scan (Mamba S6) recurrence — TPU-native JAX implementations.

Semantics mirror the reference selective scan contract
(/root/reference/models/videomamba/mamba_simple.py:30-106, the documented
``_selective_scan_ref``): float32 internals, ``delta = softplus(delta + bias)``,
input-dependent B/C, D skip connection, ``silu(z)`` gating, optional
``initial_state`` and ``return_last_state`` for streaming.

The recurrence per (batch b, channel d, state n):

    h[t] = exp(delta[t] * A) * h[t-1] + delta[t] * B[t] * u[t]
    y[t] = sum_n C[t, n] * h[t, n]   (+ D * u[t], then * silu(z[t]))

Two implementations share one contract:

* ``method="ref"`` — a plain ``lax.scan`` over time. The readable oracle;
  everything else is tested against it.
* ``method="chunked"`` — the production path: an outer ``lax.scan`` over
  fixed-size time chunks carrying the (B, D, N) state, with an inner
  ``lax.associative_scan`` inside each chunk. Peak memory is bounded by the
  chunk (never materializes the full (B, L, D, N) tensor), it is fully
  differentiable, and XLA maps the inner combine onto the VPU.

Layout notes (TPU): the native layout here is ``(B, L, D)`` with the channel
dimension minor (d_inner is a multiple of 128 for all published VideoMamba
sizes, so it tiles onto the 8x128 VPU lanes). A reference-layout wrapper
(``selective_scan``; arrays shaped (B, D, L) like the CUDA kernels take) is
provided for drop-in familiarity. State is always ``(B, D, N)`` float32, the
frozen streaming-contract layout.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

DEFAULT_CHUNK_SIZE = 64


def _prepare_delta(delta: Array, delta_bias: Optional[Array], delta_softplus: bool) -> Array:
    """Apply bias and softplus in float32 (reference mamba_simple.py:46-49)."""
    delta = delta.astype(jnp.float32)
    if delta_bias is not None:
        delta = delta + delta_bias.astype(jnp.float32)[None, None, :]
    if delta_softplus:
        delta = jax.nn.softplus(delta)
    return delta


def _scan_ref_bld(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    initial_state: Array,
) -> Tuple[Array, Array]:
    """Sequential oracle: lax.scan over L. All inputs float32, layout (B, L, ...).

    Returns (y (Bt, L, D) float32, last_state (Bt, N, D) float32).
    """
    A_t = A.T  # (N, D)

    def step(h, xs):
        # h: (Bt, N, D); delta_t/u_t: (Bt, D); B_t/C_t: (Bt, N)
        delta_t, u_t, B_t, C_t = xs
        dA = jnp.exp(delta_t[:, None, :] * A_t[None, :, :])  # (Bt, N, D)
        dBu = (delta_t * u_t)[:, None, :] * B_t[:, :, None]  # (Bt, N, D)
        h = dA * h + dBu
        y_t = jnp.einsum(
            "bnd,bn->bd", h, C_t, precision=jax.lax.Precision.HIGHEST
        )
        return h, y_t

    xs = (
        jnp.moveaxis(delta, 1, 0),
        jnp.moveaxis(u, 1, 0),
        jnp.moveaxis(B, 1, 0),
        jnp.moveaxis(C, 1, 0),
    )
    h_last, ys = lax.scan(step, initial_state, xs)
    return jnp.moveaxis(ys, 0, 1), h_last


def _first_order_combine(elem_i, elem_j):
    """Associative combine for h' = a * h + b recurrences."""
    a_i, b_i = elem_i
    a_j, b_j = elem_j
    return a_i * a_j, a_j * b_i + b_j


def _scan_chunked_bld(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    initial_state: Array,
    chunk_size: int,
) -> Tuple[Array, Array]:
    """Chunked scan: outer lax.scan over chunks, inner associative scan.

    All inputs float32, layout (Bt, L, ...). Returns (y, last_state) with
    last_state shaped (Bt, N, D).
    """
    bsz, seqlen, d = u.shape
    n = A.shape[1]
    A_t = A.T  # (N, D)

    chunk = min(chunk_size, seqlen)
    pad = (-seqlen) % chunk
    if pad:
        # Pad with delta=0 => exp(0*A)=1, dBu=0: state passes through padded
        # steps untouched, so last_state is exact; padded y rows are dropped.
        zpad = ((0, 0), (0, pad), (0, 0))
        u = jnp.pad(u, zpad)
        delta = jnp.pad(delta, zpad)
        B = jnp.pad(B, zpad)
        C = jnp.pad(C, zpad)
    num_chunks = (seqlen + pad) // chunk

    def to_chunks(x):
        return x.reshape(bsz, num_chunks, chunk, x.shape[-1]).swapaxes(0, 1)

    u_c, delta_c, B_c, C_c = map(to_chunks, (u, delta, B, C))

    def chunk_body(h, xs):
        # h: (Bt, N, D); u_k/delta_k: (Bt, c, D); B_k/C_k: (Bt, c, N)
        u_k, delta_k, B_k, C_k = xs
        dA = delta_k[:, :, None, :] * A_t[None, None, :, :]  # (Bt, c, N, D)
        a = jnp.exp(dA)
        b = (delta_k * u_k)[:, :, None, :] * B_k[..., None]  # (Bt, c, N, D)
        # Fold the carried state into the first element of the chunk.
        b = b.at[:, 0].add(a[:, 0] * h)
        _, h_all = lax.associative_scan(_first_order_combine, (a, b), axis=1)
        y_k = jnp.einsum(
            "bcnd,bcn->bcd", h_all, C_k, precision=jax.lax.Precision.HIGHEST
        )
        return h_all[:, -1], y_k

    h_last, ys = lax.scan(chunk_body, initial_state, (u_c, delta_c, B_c, C_c))
    y = ys.swapaxes(0, 1).reshape(bsz, num_chunks * chunk, d)
    if pad:
        y = y[:, :seqlen]
    return y, h_last


def _xla_fused_scan(u, delta, A, B, C, D, z, delta_bias, h0, softplus,
                    chunk_size=DEFAULT_CHUNK_SIZE):
    """Fully-fused XLA scan (prepare + recurrence + D-skip + z-gate).

    Reference semantics in one differentiable function; used directly and as
    the recomputation backward for the Pallas kernel.
    """
    dtype_in = u.dtype
    u32 = u.astype(jnp.float32)
    delta32 = _prepare_delta(delta, delta_bias, softplus)
    y, h_last = _scan_chunked_bld(
        u32, delta32, A.astype(jnp.float32), B.astype(jnp.float32),
        C.astype(jnp.float32), h0.astype(jnp.float32).swapaxes(1, 2),
        chunk_size,
    )
    out = y
    if D is not None:
        out = out + u32 * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    return out.astype(dtype_in), h_last.swapaxes(1, 2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _pallas_fused_scan(u, delta, A, B, C, D, z, delta_bias, h0, softplus):
    """Pallas forward / XLA-recompute backward fused selective scan."""
    from videomamba_tpu.ops.pallas.scan import scan_chunked_pallas

    return scan_chunked_pallas(
        u, delta, A, B, C, D, z, delta_bias, h0,
        softplus=softplus, has_z=z is not None,
    )


def _pallas_fused_scan_fwd(u, delta, A, B, C, D, z, delta_bias, h0, softplus):
    out = _pallas_fused_scan(u, delta, A, B, C, D, z, delta_bias, h0, softplus)
    return out, (u, delta, A, B, C, D, z, delta_bias, h0)


def _pallas_fused_scan_bwd(softplus, residuals, cotangents):
    args = residuals
    present = [a is not None for a in args]
    packed = tuple(a for a in args if a is not None)

    def f(*p):
        it = iter(p)
        full = [next(it) if flag else None for flag in present]
        return _xla_fused_scan(*full, softplus=softplus)

    _, vjp = jax.vjp(f, *packed)
    grads_packed = iter(vjp(cotangents))
    return tuple(next(grads_packed) if flag else None for flag in present)


_pallas_fused_scan.defvjp(_pallas_fused_scan_fwd, _pallas_fused_scan_bwd)


def selective_scan_bld(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    initial_state: Optional[Array] = None,
    return_last_state: bool = False,
    method: str = "chunked",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> Union[Array, Tuple[Array, Array]]:
    """Selective scan in TPU-native (B, L, D) layout.

    Args:
        u: input, (B, L, D).
        delta: timestep, (B, L, D).
        A: state matrix, (D, N). Real-valued.
        B: input projection, (B, L, N) (input-dependent).
        C: output projection, (B, L, N) (input-dependent).
        D: skip connection, (D,) or None.
        z: gate, (B, L, D) or None; output is multiplied by silu(z).
        delta_bias: (D,) added to delta before softplus.
        delta_softplus: apply softplus to delta.
        initial_state: (B, D, N) float-castable carried state or None (zeros).
        return_last_state: also return the final state, (B, D, N) float32.
        method: "chunked" (default) or "ref" (sequential oracle).
        chunk_size: time-chunk length for the chunked method.

    Returns:
        out (B, L, D) in u.dtype, or (out, last_state) if return_last_state.
    """
    if u.ndim != 3 or B.ndim != 3 or C.ndim != 3:
        raise ValueError("u, B, C must be rank-3: (B, L, D) and (B, L, N).")
    dtype_in = u.dtype
    bsz, seqlen, d = u.shape
    n = A.shape[1]

    if method == "pallas":
        from videomamba_tpu.ops.pallas.scan import pallas_scan_supported

        if pallas_scan_supported(d, n):
            h0_full = (
                jnp.zeros((bsz, d, n), jnp.float32)
                if initial_state is None
                else initial_state
            )
            out, h_last = _pallas_fused_scan(
                u, delta, A, B, C, D, z, delta_bias, h0_full, delta_softplus
            )
            if return_last_state:
                return out, h_last
            return out
        method = "chunked"  # shape not kernel-compatible; exact XLA fallback

    u32 = u.astype(jnp.float32)
    delta32 = _prepare_delta(delta, delta_bias, delta_softplus)
    A32 = A.astype(jnp.float32)
    B32 = B.astype(jnp.float32)
    C32 = C.astype(jnp.float32)

    if initial_state is None:
        h0 = jnp.zeros((bsz, n, d), dtype=jnp.float32)
    else:
        h0 = initial_state.astype(jnp.float32).swapaxes(1, 2)  # (B, D, N) -> (B, N, D)

    if method == "ref":
        y, h_last = _scan_ref_bld(u32, delta32, A32, B32, C32, h0)
    elif method == "chunked":
        y, h_last = _scan_chunked_bld(u32, delta32, A32, B32, C32, h0, chunk_size)
    else:
        raise ValueError(f"Unknown selective_scan method: {method!r}")

    out = y
    if D is not None:
        out = out + u32 * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    out = out.astype(dtype_in)

    if return_last_state:
        return out, h_last.swapaxes(1, 2)  # (B, D, N) float32
    return out


def selective_scan(
    u: Array,
    delta: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    delta_bias: Optional[Array] = None,
    delta_softplus: bool = False,
    initial_state: Optional[Array] = None,
    return_last_state: bool = False,
    method: str = "chunked",
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> Union[Array, Tuple[Array, Array]]:
    """Reference-layout selective scan: u/delta/z (B, D, L), B/C (B, N, L).

    Drop-in layout twin of the reference ``selective_scan_fn``
    (mamba_simple.py:109-172); transposes to (B, L, D) and dispatches to
    :func:`selective_scan_bld`.
    """
    if u.ndim != 3 or B.ndim != 3 or C.ndim != 3:
        raise ValueError("u, B, C must be rank-3: (B, D, L) and (B, N, L).")
    out = selective_scan_bld(
        u.swapaxes(1, 2),
        delta.swapaxes(1, 2),
        A,
        B.swapaxes(1, 2),
        C.swapaxes(1, 2),
        D=D,
        z=None if z is None else z.swapaxes(1, 2),
        delta_bias=delta_bias,
        delta_softplus=delta_softplus,
        initial_state=initial_state,
        return_last_state=return_last_state,
        method=method,
        chunk_size=chunk_size,
    )
    if return_last_state:
        y, h = out
        return y.swapaxes(1, 2), h
    return out.swapaxes(1, 2)


def selective_state_update(
    state: Array,
    x: Array,
    dt: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    dt_bias: Optional[Array] = None,
    dt_softplus: bool = False,
) -> Tuple[Array, Array]:
    """Single-token recurrence step (decode path).

    Functional equivalent of mamba-ssm's Triton ``selective_state_update``
    (used by the reference at mamba_simple.py:483-494) — but pure: returns
    ``(y, new_state)`` instead of updating in place.

    Args:
        state: (B, D, N) carried SSM state.
        x: (B, D) current-token input.
        dt: (B, D) timestep.
        A: (D, N); B, C: (B, N); D: (D,); z: (B, D); dt_bias: (D,).

    Returns:
        y: (B, D) in x.dtype; new_state: (B, D, N) in state.dtype.
    """
    dtype_in = x.dtype
    x32 = x.astype(jnp.float32)
    dt32 = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt32 = dt32 + dt_bias.astype(jnp.float32)[None, :]
    if dt_softplus:
        dt32 = jax.nn.softplus(dt32)
    A32 = A.astype(jnp.float32)
    dA = jnp.exp(dt32[:, :, None] * A32[None, :, :])  # (B, D, N)
    dBx = (dt32 * x32)[:, :, None] * B.astype(jnp.float32)[:, None, :]  # (B, D, N)
    new_state = dA * state.astype(jnp.float32) + dBx
    y = jnp.einsum(
        "bdn,bn->bd", new_state, C.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    if D is not None:
        y = y + x32 * D.astype(jnp.float32)[None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    return y.astype(dtype_in), new_state.astype(state.dtype)
