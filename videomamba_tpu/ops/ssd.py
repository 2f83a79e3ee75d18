"""SSD (state-space duality / Mamba-2) scan — TPU-native chunked matmul form.

The framework's Mamba-1 selective scan (ops/selective_scan.py, the reference
semantics at /root/reference/models/videomamba/mamba_simple.py:30-106) has a
per-(channel, state) decay ``exp(delta[t] * A[d, n])`` — the recurrence is
irreducibly elementwise, so on TPU it runs on the VPU. The measured floor is
~19 ns/step for the pure 2-op chain (ROADMAP "walk-floor analysis"): at Base
serving shapes the walk alone is ~1 ms/layer and caps training MFU at ~21%.

Mamba-2 (Dao & Gu, "Transformers are SSMs", arXiv:2405.21060) restricts the
decay to a *scalar per head*, ``exp(delta[t, h] * A[h])``, which makes the
sequence mixing a semiseparable matrix — computable chunk-by-chunk with plain
matmuls (the SSD algorithm). On TPU that moves the recurrence onto the MXU:

    within a chunk of Q steps (all einsums / MXU):
        S[q, k] = C[q] . B[k] * exp(s[q] - s[k]) * dt[k]   (q >= k)
        Y_intra = S @ X
    across chunks (tiny sequential part, lax.scan over L/Q states):
        state' = exp(sum dtA) * state + sum_k exp(s_last - s[k]) dt[k] B[k] X[k]
        Y_inter[q] = exp(s[q]) * C[q] . state_prev

This module has no counterpart in the reference repo (which is Mamba-1 only);
it exists because the walk-floor analysis showed the Mamba-1 recurrence is the
hard perf ceiling on this hardware and the scalar-decay reformulation is the
documented algorithmic fix. Contract conventions (functional state, (B, L, ...)
channel-minor layouts, fp32 decay internals, ``initial_state`` /
``return_last_state`` streaming) follow ops/selective_scan.py.

Shapes (heads H, head dim P, groups G dividing H, state N):

    x  (B, L, H, P)    dt (B, L, H)     A (H,) negative
    B  (B, L, G, N)    C  (B, L, G, N)  D (H,) or None
    z  (B, L, H, P) or None              state (B, H, P, N) float32
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

DEFAULT_CHUNK_SIZE = 64

_HIGHEST = lax.Precision.HIGHEST


def _prepare_dt(dt: Array, dt_bias: Optional[Array], dt_softplus: bool) -> Array:
    """Bias + softplus in float32 (same convention as selective_scan)."""
    dt = dt.astype(jnp.float32)
    if dt_bias is not None:
        dt = dt + dt_bias.astype(jnp.float32)[None, None, :]
    if dt_softplus:
        dt = jax.nn.softplus(dt)
    return dt


def _expand_groups(t: Array, nheads: int) -> Array:
    """(B, ..., G, N) -> (B, ..., H, N); heads are contiguous within a group."""
    g = t.shape[-2]
    if g == nheads:
        return t
    rep = nheads // g
    return jnp.repeat(t, rep, axis=-2)


def _finish(y: Array, x: Array, D: Optional[Array], z: Optional[Array],
            out_dtype: jnp.dtype) -> Array:
    if D is not None:
        d = D.astype(jnp.float32)
        if d.ndim == 1:  # (H,) -> broadcast over P
            d = d[:, None]
        y = y + d[None, None] * x.astype(jnp.float32)
    if z is not None:
        y = y * jax.nn.silu(z.astype(jnp.float32))
    return y.astype(out_dtype)


# --------------------------------------------------------------------- oracle


def ssd_ref(
    x: Array,
    dt: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    dt_bias: Optional[Array] = None,
    dt_softplus: bool = True,
    initial_state: Optional[Array] = None,
    return_last_state: bool = False,
) -> Union[Array, Tuple[Array, Array]]:
    """Sequential oracle: plain ``lax.scan`` over time, fp32 internals.

    The readable single-step recurrence every other implementation is tested
    against (the SSD analog of ``selective_scan(method="ref")``).
    """
    bsz, seqlen, nheads, hdim = x.shape
    n = B.shape[-1]
    dt_p = _prepare_dt(dt, dt_bias, dt_softplus)  # (B, L, H)
    A32 = A.astype(jnp.float32)
    Bh = _expand_groups(B.astype(jnp.float32), nheads)  # (B, L, H, N)
    Ch = _expand_groups(C.astype(jnp.float32), nheads)
    x32 = x.astype(jnp.float32)

    h0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((bsz, nheads, hdim, n), jnp.float32)
    )

    def step(h, xs):
        x_t, dt_t, B_t, C_t = xs  # (B,H,P) (B,H) (B,H,N) (B,H,N)
        dA = jnp.exp(dt_t * A32[None])  # (B, H)
        h = dA[:, :, None, None] * h + (
            (dt_t[:, :, None] * x_t)[..., None] * B_t[:, :, None, :]
        )
        y_t = jnp.einsum("bhpn,bhn->bhp", h, C_t, precision=_HIGHEST)
        return h, y_t

    xs = (
        x32.swapaxes(0, 1), dt_p.swapaxes(0, 1),
        Bh.swapaxes(0, 1), Ch.swapaxes(0, 1),
    )
    h_last, ys = lax.scan(step, h0, xs)
    y = _finish(ys.swapaxes(0, 1), x32, D, z, x.dtype)
    if return_last_state:
        return y, h_last
    return y


# ----------------------------------------------------------------- production


def ssd_chunked(
    x: Array,
    dt: Array,
    A: Array,
    B: Array,
    C: Array,
    D: Optional[Array] = None,
    z: Optional[Array] = None,
    dt_bias: Optional[Array] = None,
    dt_softplus: bool = True,
    initial_state: Optional[Array] = None,
    return_last_state: bool = False,
    chunk_size: int = DEFAULT_CHUNK_SIZE,
    method: str = "chunked",
) -> Union[Array, Tuple[Array, Array]]:
    """Chunked SSD: MXU einsums within chunks + a tiny state scan across them.

    Fully differentiable (the backward is einsum transposes — also MXU).
    Decay logits/cumsums stay float32; the O(L*Q) attention-like factors are
    cast to ``x.dtype`` before the big contractions, so bf16 inputs run bf16
    matmuls (fp32 accumulation on the MXU) — same policy as the fused Mamba-1
    kernels. Peak transient memory is O(B * L * Q * H) for the intra-chunk
    factor; ``chunk_size`` trades that against the length of the cross-chunk
    scan.

    ``method="pallas"`` routes the core recurrence through the fused VMEM
    kernel (ops/pallas/ssd_scan.py) — same semantics, none of the O(L*Q*H)
    HBM traffic; its backward differentiates this XLA core.
    """
    dt_p = _prepare_dt(dt, dt_bias, dt_softplus)  # fp32 BEFORE padding: the
    # pad below must be a no-op step (dt == 0), not softplus(bias).
    if method == "pallas":
        from videomamba_tpu.ops.pallas.ssd_scan import ssd_core_pallas

        y, h_last = ssd_core_pallas(
            x, dt_p, A, B, C, initial_state, chunk_size=chunk_size
        )
    else:
        y, h_last = ssd_core_chunked(
            x, dt_p, A, B, C, initial_state, chunk_size=chunk_size
        )
    y = _finish(y, x.astype(jnp.float32), D, z, x.dtype)
    if return_last_state:
        return y, h_last
    return y


def ssd_core_chunked(
    x: Array,
    dt_p: Array,
    A: Array,
    B: Array,
    C: Array,
    initial_state: Optional[Array],
    chunk_size: int = DEFAULT_CHUNK_SIZE,
) -> Tuple[Array, Array]:
    """The bare chunked recurrence: post-softplus ``dt_p`` in, no D/z epilogue.

    Returns ``(y float32 (B, L, H, P), h_last float32 (B, H, P, N))``. This is
    both the production XLA path (via :func:`ssd_chunked`) and the gradient
    oracle the Pallas kernel's custom_vjp backward differentiates through
    (ops/pallas/ssd_scan.py).
    """
    bsz, seqlen, nheads, hdim = x.shape
    n = B.shape[-1]
    q = int(chunk_size)

    pad = (-seqlen) % q
    if pad:
        x_p = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
        dt_p = jnp.pad(dt_p, ((0, 0), (0, pad), (0, 0)))
        B_p = jnp.pad(B, ((0, 0), (0, pad), (0, 0), (0, 0)))
        C_p = jnp.pad(C, ((0, 0), (0, pad), (0, 0), (0, 0)))
    else:
        x_p, B_p, C_p = x, B, C
    lp = seqlen + pad
    nc = lp // q

    cdt = x.dtype  # compute dtype for the big contractions
    xc = x_p.reshape(bsz, nc, q, nheads, hdim)
    dtc = dt_p.reshape(bsz, nc, q, nheads)  # fp32
    Bc = B_p.reshape(bsz, nc, q, -1, n)
    Cc = C_p.reshape(bsz, nc, q, -1, n)

    # Decay cumsums (fp32; differences are <= 0 so every exp is <= 1).
    dtA = dtc * A.astype(jnp.float32)[None, None, None, :]  # (B,C,Q,H)
    s = jnp.cumsum(dtA, axis=2)  # inclusive

    # ---- intra-chunk: Y[q'] = sum_{k<=q'} (C[q'].B[k]) exp(s q'-s k) dt[k] X[k]
    cb = jnp.einsum(
        "bcqgn,bckgn->bcgqk", Cc.astype(cdt), Bc.astype(cdt)
    )  # (B,C,G,Q,Q)
    ngroups = cb.shape[2]
    if ngroups != nheads:
        cb = jnp.repeat(cb, nheads // ngroups, axis=2)  # -> (B,C,H,Q,Q)
    seg = s[:, :, :, None, :] - s[:, :, None, :, :]  # (B,C,Q,Q,H) = s[q']-s[k]
    causal = jnp.tril(jnp.ones((q, q), jnp.bool_))
    # Mask BEFORE the exp: the acausal half has seg > 0 (exp overflows), and
    # masking after would leak NaN through the where in the backward.
    seg = jnp.where(causal[None, None, :, :, None], seg, -jnp.inf)
    decay = jnp.exp(seg)
    m = cb * jnp.moveaxis(decay.astype(cdt), -1, 2)  # (B,C,H,Q,Q)
    m = m * dtc.astype(cdt).transpose(0, 1, 3, 2)[:, :, :, None, :]  # dt[k]
    y_intra = jnp.einsum("bchqk,bckhp->bcqhp", m, xc)

    # ---- per-chunk final states: S_c = sum_k exp(s_last - s[k]) dt[k] B[k] (x) X[k]
    decay_last = jnp.exp(s[:, :, -1:, :] - s)  # (B,C,Q,H)
    Bh = _expand_groups(Bc, nheads)  # (B,C,Q,H,N)
    wgt = (dtc * decay_last).astype(cdt)  # (B,C,Q,H)
    S = jnp.einsum("bcqhp,bcqh,bcqhn->bchpn", xc, wgt, Bh.astype(cdt))
    S = S.astype(jnp.float32)

    # ---- cross-chunk state recurrence (the only sequential part: nc steps
    # over a (B,H,P,N) carry — microscopic next to the einsums above).
    chunk_decay = jnp.exp(s[:, :, -1, :])  # (B,C,H)
    h0 = (
        initial_state.astype(jnp.float32)
        if initial_state is not None
        else jnp.zeros((bsz, nheads, hdim, n), jnp.float32)
    )

    def chunk_step(h, xs):
        dec_c, S_c = xs  # (B,H), (B,H,P,N)
        h_new = dec_c[:, :, None, None] * h + S_c
        return h_new, h  # emit the state *entering* this chunk

    h_last, h_prev = lax.scan(
        chunk_step, h0, (chunk_decay.swapaxes(0, 1), S.swapaxes(0, 1))
    )
    h_prev = h_prev.swapaxes(0, 1)  # (B,C,H,P,N)

    # ---- inter-chunk contribution: Y[q'] += exp(s[q']) C[q'] . h_prev
    Ch = _expand_groups(Cc, nheads)  # (B,C,Q,H,N)
    cw = (Ch.astype(jnp.float32) * jnp.exp(s)[..., None]).astype(cdt)
    y_inter = jnp.einsum("bcqhn,bchpn->bcqhp", cw, h_prev.astype(cdt))

    y = (y_intra + y_inter).astype(jnp.float32).reshape(bsz, lp, nheads, hdim)
    return y[:, :seqlen], h_last


# --------------------------------------------------------------------- decode


def ssd_state_update(
    state: Array,
    x_t: Array,
    dt_t: Array,
    A: Array,
    B_t: Array,
    C_t: Array,
    D: Optional[Array] = None,
    z_t: Optional[Array] = None,
    dt_bias: Optional[Array] = None,
    dt_softplus: bool = True,
) -> Tuple[Array, Array]:
    """Single-token SSD step (the ``selective_state_update`` analog).

    Args:
        state: (B, H, P, N) float32 carried state.
        x_t: (B, H, P); dt_t: (B, H); B_t/C_t: (B, G, N); z_t: (B, H, P)|None.

    Returns (y_t (B, H, P) in x_t.dtype, new_state (B, H, P, N) float32).
    """
    nheads = x_t.shape[1]
    dt32 = dt_t.astype(jnp.float32)
    if dt_bias is not None:
        dt32 = dt32 + dt_bias.astype(jnp.float32)[None, :]
    if dt_softplus:
        dt32 = jax.nn.softplus(dt32)
    dA = jnp.exp(dt32 * A.astype(jnp.float32)[None])  # (B, H)
    Bh = _expand_groups(B_t.astype(jnp.float32), nheads)  # (B, H, N)
    Ch = _expand_groups(C_t.astype(jnp.float32), nheads)
    x32 = x_t.astype(jnp.float32)
    new_state = dA[:, :, None, None] * state.astype(jnp.float32) + (
        (dt32[:, :, None] * x32)[..., None] * Bh[:, :, None, :]
    )
    y = jnp.einsum("bhpn,bhn->bhp", new_state, Ch, precision=_HIGHEST)
    if D is not None:
        d = D.astype(jnp.float32)
        if d.ndim == 1:
            d = d[:, None]
        y = y + d[None] * x32
    if z_t is not None:
        y = y * jax.nn.silu(z_t.astype(jnp.float32))
    return y.astype(x_t.dtype), new_state
