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


def _fused_scan_bwd_impl(residuals, cotangents, softplus,
                         chunk_size=DEFAULT_CHUNK_SIZE):
    """Hand-derived backward of the fused selective scan.

    Why manual: the gradient of the first-order recurrence is itself a
    first-order recurrence (reversed in time), so the whole backward is two
    more chunked associative scans plus elementwise math — whereas letting
    JAX differentiate through ``lax.associative_scan`` produces a program an
    order of magnitude slower (measured: dominates the Base training step).

    Derivation (0-based t, fp32 internals; hp = h_{t-1}):
      out_t = (y_t + D u_t) * silugate(z_t),  y_t = sum_n C_tn h_tnd
      h_t = a_t h_{t-1} + delta_t u_t B_tn,   a_t = exp(delta_t A)
      dh_t = C_tn dy_td + a_{t+1} dh_{t+1}  (+ g_hlast at t = L-1)
      Carry s_t := a_{t+1} dh_{t+1}; then s_{t-1} = a_t (contrib_t + s_t) —
      chunk-local coefficients, associative-scannable over reversed time;
      the final carry is exactly dh0.
      da = dh * h_{t-1};  dA += sum da*a*delta;  ddelta = sum_n da*a*A
        + u * (sum_n dh*B);  du = delta * (sum_n dh*B) + D-skip/gate parts;
      dB = sum_d dh*delta*u;  dC = sum_d h*dy;
      softplus chain: sigmoid(raw+bias) == 1 - exp(-delta).
    """
    u, delta_raw, A, B, C, D, z, delta_bias, h0 = residuals
    g_out, g_hlast = cotangents

    bsz, seqlen, d = u.shape
    n = A.shape[1]
    A32 = A.astype(jnp.float32)
    A_t = A32.T  # (N, D)

    u32 = u.astype(jnp.float32)
    delta32 = _prepare_delta(delta_raw, delta_bias, softplus)
    g32 = g_out.astype(jnp.float32)
    z32 = z.astype(jnp.float32) if z is not None else None
    D32 = D.astype(jnp.float32) if D is not None else None

    chunk = min(chunk_size, seqlen)
    pad = (-seqlen) % chunk
    if pad:
        zpad = ((0, 0), (0, pad), (0, 0))
        u32 = jnp.pad(u32, zpad)
        delta32 = jnp.pad(delta32, zpad)  # delta=0 => a=1: state/grad no-op
        B = jnp.pad(B, zpad)
        C = jnp.pad(C, zpad)
        g32 = jnp.pad(g32, zpad)
        if z32 is not None:
            z32 = jnp.pad(z32, zpad)
    num_chunks = (seqlen + pad) // chunk

    def to_chunks(x):
        return x.reshape(bsz, num_chunks, chunk, x.shape[-1]).swapaxes(0, 1)

    u_c = to_chunks(u32)
    delta_c = to_chunks(delta32)
    B_c = to_chunks(B.astype(jnp.float32))
    C_c = to_chunks(C.astype(jnp.float32))
    g_c = to_chunks(g32)
    z_c = to_chunks(z32) if z32 is not None else None

    h0_nd = h0.astype(jnp.float32).swapaxes(1, 2)  # (B, N, D)

    # ---- pass 1 (forward): carry-in state of every chunk (checkpoints).
    def fwd_bound_body(h, xs):
        u_k, delta_k, B_k = xs
        a = jnp.exp(delta_k[:, :, None, :] * A_t[None, None])
        b = (delta_k * u_k)[:, :, None, :] * B_k[..., None]
        b = b.at[:, 0].add(a[:, 0] * h)
        _, h_all = lax.associative_scan(_first_order_combine, (a, b), axis=1)
        return h_all[:, -1], h

    _, h_in = lax.scan(fwd_bound_body, h0_nd, (u_c, delta_c, B_c))
    # h_in[k] = state entering chunk k, shape (K, B, N, D)

    # ---- pass 2 (reverse over chunks): gradients.
    hlast_ct = (
        g_hlast.astype(jnp.float32).swapaxes(1, 2)
        if g_hlast is not None
        else jnp.zeros((bsz, n, d), jnp.float32)
    )
    dA_acc0 = jnp.zeros((n, d), jnp.float32)
    dD_acc0 = jnp.zeros((d,), jnp.float32)
    dbias_acc0 = jnp.zeros((d,), jnp.float32)

    def bwd_chunk(carry, xs):
        s_carry, dA_acc, dD_acc, dbias_acc = carry
        u_k, delta_k, B_k, C_k, g_k, z_k, h_in_k = xs

        a = jnp.exp(delta_k[:, :, None, :] * A_t[None, None])  # (B,c,N,D)
        dbu = (delta_k * u_k)[:, :, None, :] * B_k[..., None]

        # Recompute within-chunk states and their predecessors.
        b_fold = dbu.at[:, 0].add(a[:, 0] * h_in_k)
        _, h_all = lax.associative_scan(_first_order_combine, (a, b_fold), axis=1)
        h_prev = jnp.concatenate([h_in_k[:, None], h_all[:, :-1]], axis=1)

        # Gate / D-skip local grads.
        y_pre = jnp.einsum(
            "bcnd,bcn->bcd", h_all, C_k, precision=jax.lax.Precision.HIGHEST
        )
        if D32 is not None:
            pre = y_pre + u_k * D32[None, None, :]
        else:
            pre = y_pre
        if z_k is not None:
            sig = jax.nn.sigmoid(z_k)
            gate = z_k * sig
            g2 = g_k * gate
            dz_k = g_k * pre * (sig * (1.0 + z_k * (1.0 - sig)))
        else:
            g2 = g_k
            dz_k = jnp.zeros_like(g_k)
        if D32 is not None:
            dD_acc = dD_acc + jnp.sum(g2 * u_k, axis=(0, 1))
        dy = g2  # (B,c,D)

        # Reverse-time dh via an associative scan on flipped arrays:
        # S_{r+1} = a_flip[r] * (contrib_flip[r] + S_r), S_0 = s_carry.
        contrib = C_k[..., None] * dy[:, :, None, :]        # (B,c,N,D)
        a_f = jnp.flip(a, axis=1)
        bprime = a_f * jnp.flip(contrib, axis=1)
        bprime = bprime.at[:, 0].add(a_f[:, 0] * s_carry)
        _, S_incl = lax.associative_scan(_first_order_combine, (a_f, bprime), axis=1)
        S_excl = jnp.concatenate([s_carry[:, None], S_incl[:, :-1]], axis=1)
        dh = jnp.flip(jnp.flip(contrib, axis=1) + S_excl, axis=1)  # (B,c,N,D)
        new_s_carry = S_incl[:, -1]  # = a_0 * dh_0 of this chunk

        # Parameter/input grads.
        da_a = dh * h_prev * a                               # da ⊙ a
        dA_acc = dA_acc + jnp.sum(da_a * delta_k[:, :, None, :], axis=(0, 1))
        term1 = jnp.einsum(
            "bcnd,nd->bcd", da_a, A_t, precision=jax.lax.Precision.HIGHEST
        )
        sB = jnp.einsum(
            "bcnd,bcn->bcd", dh, B_k, precision=jax.lax.Precision.HIGHEST
        )
        ddelta_k = term1 + u_k * sB
        du_k = delta_k * sB
        if D32 is not None:
            du_k = du_k + g2 * D32[None, None, :]
        dB_k = jnp.einsum(
            "bcnd,bcd->bcn", dh, delta_k * u_k,
            precision=jax.lax.Precision.HIGHEST,
        )
        dC_k = jnp.einsum(
            "bcnd,bcd->bcn", h_all, dy, precision=jax.lax.Precision.HIGHEST
        )

        # delta -> raw-delta chain (softplus'(x) = sigmoid(x) = 1 - e^{-sp}).
        if softplus:
            ddelta_raw_k = ddelta_k * (1.0 - jnp.exp(-delta_k))
        else:
            ddelta_raw_k = ddelta_k
        if delta_bias is not None:
            dbias_acc = dbias_acc + jnp.sum(ddelta_raw_k, axis=(0, 1))

        return (new_s_carry, dA_acc, dD_acc, dbias_acc), (
            du_k, ddelta_raw_k, dB_k, dC_k, dz_k
        )

    xs = (u_c, delta_c, B_c, C_c, g_c,
          z_c if z_c is not None else jnp.zeros_like(u_c), h_in)
    xs_rev = jax.tree_util.tree_map(lambda x: jnp.flip(x, axis=0), xs)

    def bwd_chunk_dispatch(carry, xs_one):
        u_k, delta_k, B_k, C_k, g_k, z_k, h_in_k = xs_one
        return bwd_chunk(
            carry,
            (u_k, delta_k, B_k, C_k, g_k,
             z_k if z32 is not None else None, h_in_k),
        )

    (dh0_nd, dA32, dD32, dbias32), ys = lax.scan(
        bwd_chunk_dispatch, (hlast_ct, dA_acc0, dD_acc0, dbias_acc0), xs_rev
    )
    du_r, ddelta_r, dB_r, dC_r, dz_r = ys  # (K, B, c, ...) in reverse order

    def from_chunks(x, feat):
        x = jnp.flip(x, axis=0).swapaxes(0, 1)
        x = x.reshape(bsz, num_chunks * chunk, feat)
        return x[:, :seqlen]

    du = from_chunks(du_r, d).astype(u.dtype)
    ddelta = from_chunks(ddelta_r, d).astype(delta_raw.dtype)
    dB = from_chunks(dB_r, n).astype(B.dtype)
    dC = from_chunks(dC_r, n).astype(C.dtype)
    dz = from_chunks(dz_r, d).astype(z.dtype) if z is not None else None
    dA = dA32.T.astype(A.dtype)  # accumulator is (N, D); primal A is (D, N)
    dD = dD32.astype(D.dtype) if D is not None else None
    dbias = dbias32.astype(delta_bias.dtype) if delta_bias is not None else None
    dh0 = dh0_nd.swapaxes(1, 2).astype(h0.dtype)
    return (du, ddelta, dA, dB, dC, dD, dz, dbias, dh0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _pallas_fused_scan(u, delta, A, B, C, D, z, delta_bias, h0, softplus):
    """Pallas forward; backward is the Pallas gradient kernel (with the
    hand-derived chunked-XLA backward as the exact fallback)."""
    from videomamba_tpu.ops.pallas.scan import scan_chunked_pallas

    return scan_chunked_pallas(
        u, delta, A, B, C, D, z, delta_bias, h0,
        softplus=softplus, has_z=z is not None,
    )


def _pallas_fused_scan_fwd(u, delta, A, B, C, D, z, delta_bias, h0, softplus):
    from videomamba_tpu.ops.pallas.scan import scan_chunked_pallas

    out, h_last, hckpt = scan_chunked_pallas(
        u, delta, A, B, C, D, z, delta_bias, h0,
        softplus=softplus, has_z=z is not None, checkpoints=True,
    )
    return (out, h_last), (u, delta, A, B, C, D, z, delta_bias, h0, hckpt)


def _pallas_fused_scan_bwd(softplus, residuals, cotangents):
    *primals, hckpt = residuals
    u, delta, A, B, C, D, z, delta_bias, h0 = primals
    g_out, g_hlast = cotangents
    from videomamba_tpu.ops.pallas.scan import scan_bwd_pallas

    grads = scan_bwd_pallas(
        u, delta, A, B, C, D, z, delta_bias, hckpt, g_out, g_hlast,
        softplus=softplus, has_z=z is not None,
    )
    du, ddelta, dA, dB, dC, dD, dz, dbias, dh0 = grads
    return (du, ddelta, dA, dB, dC, dD, dz, dbias, dh0.astype(h0.dtype))


_pallas_fused_scan.defvjp(_pallas_fused_scan_fwd, _pallas_fused_scan_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _chunked_fused_scan(u, delta, A, B, C, D, z, delta_bias, h0, softplus,
                        chunk_size):
    """Chunked-XLA forward with the hand-derived chunked backward."""
    return _xla_fused_scan(
        u, delta, A, B, C, D, z, delta_bias, h0, softplus, chunk_size
    )


def _chunked_fused_scan_fwd(u, delta, A, B, C, D, z, delta_bias, h0, softplus,
                            chunk_size):
    out = _chunked_fused_scan(
        u, delta, A, B, C, D, z, delta_bias, h0, softplus, chunk_size
    )
    return out, (u, delta, A, B, C, D, z, delta_bias, h0)


def _chunked_fused_scan_bwd(softplus, chunk_size, residuals, cotangents):
    return _fused_scan_bwd_impl(residuals, cotangents, softplus, chunk_size)


_chunked_fused_scan.defvjp(_chunked_fused_scan_fwd, _chunked_fused_scan_bwd)


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

    if method == "chunked":
        h0_full = (
            jnp.zeros((bsz, d, n), jnp.float32)
            if initial_state is None
            else initial_state
        )
        out, h_last = _chunked_fused_scan(
            u, delta, A, B, C, D, z, delta_bias, h0_full, delta_softplus,
            chunk_size,
        )
        if return_last_state:
            return out, h_last
        return out

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
