"""Sequence-parallel selective scan — a designed extension beyond the reference.

The reference's only long-sequence mechanism is single-device temporal
chunking with carried state (SURVEY §5). Because the selective scan is a
first-order linear recurrence, it is also *shardable across devices along
time* — the associative-scan analogue of ring attention:

1. Shard L over the mesh axis ``sp``; each device scans its local slice from
   a zero state -> (y_local, h_local).
2. A segment's total decay has closed form: prod_t exp(delta_t * A)
   = exp(A * sum_t delta_t) — one elementwise op, no extra scan.
3. All-gather the K (segment_decay, h_local) pairs (tiny: (B, D, N) each)
   and combine the segments before this device's — an exclusive prefix of
   the first-order-recurrence monoid — giving the device's true entry state
   h0_k.
4. Correct local outputs in closed form without rescanning:
   y_t += C_t . (exp(A * cumsum(delta)_t) * h0_k), then apply the D-skip and
   silu(z) gate.

Communication: one all-gather of 2*(B, D, N) floats per layer — O(1) in L.
Use inside ``jax.shard_map`` with ``u/delta/B/C/z`` sharded on axis 1.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from videomamba_tpu.ops.selective_scan import (
    _prepare_delta,
    selective_scan_bld,
)

Array = jax.Array


def sequence_parallel_scan(
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
    axis_name: str = "sp",
    method: str = "chunked",
    correction_chunk: int = 256,
) -> Tuple[Array, Array]:
    """Selective scan over a time-sharded sequence (call inside shard_map).

    Args are the local shards, layouts as in ``selective_scan_bld``
    (u/delta/z: (B, L_loc, D); B/C: (B, L_loc, N); initial_state: (B, D, N),
    meaningful on the axis-0 device, identical-everywhere recommended).

    Returns:
        (out_local (B, L_loc, D) in u.dtype — this device's output slice,
         h_last_global (B, D, N) float32 — the post-sequence state, replicated).
    """
    dtype_in = u.dtype
    bsz, l_loc, d = u.shape
    n = A.shape[1]
    A32 = A.astype(jnp.float32)

    # Prepare delta once (bias + softplus) so local scan and closed-form
    # corrections agree exactly.
    delta32 = _prepare_delta(delta, delta_bias, delta_softplus)

    # 1. Local scan from zero state, raw outputs (D-skip/gate applied after
    #    the cross-device correction).
    y_loc, h_loc = selective_scan_bld(
        u.astype(jnp.float32), delta32, A32, B, C,
        D=None, z=None, delta_bias=None, delta_softplus=False,
        initial_state=None, return_last_state=True, method=method,
    )

    # 2. Segment decay in closed form.
    dsum = jnp.sum(delta32, axis=1)                        # (B, D)
    seg_decay = jnp.exp(A32[None] * dsum[:, :, None])      # (B, D, N)

    # 3. Exclusive prefix combine across the sp axis.
    k = lax.axis_index(axis_name)
    num = lax.axis_size(axis_name)
    decays = lax.all_gather(seg_decay, axis_name)          # (K, B, D, N)
    h_locs = lax.all_gather(h_loc, axis_name)              # (K, B, D, N)

    h_init = (
        jnp.zeros((bsz, d, n), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )

    def combine(i, h):
        # Fold segment i into h only for segments before this device.
        seg = decays[i] * h + h_locs[i]
        return jnp.where(i < k, seg, h)

    h0_local = lax.fori_loop(0, num, combine, h_init)      # (B, D, N)

    def combine_all(i, h):
        return decays[i] * h + h_locs[i]

    h_last_global = lax.fori_loop(0, num, combine_all, h_init)

    # 4. Closed-form correction, chunked over L to bound the (c, D, N)
    #    intermediate: y_t += C_t . (exp(A * cumdelta_t) * h0).
    cumdelta = jnp.cumsum(delta32, axis=1)                 # (B, L, D)
    chunk = min(correction_chunk, l_loc)
    pad = (-l_loc) % chunk
    if pad:
        cumdelta_p = jnp.pad(cumdelta, ((0, 0), (0, pad), (0, 0)))
        c_p = jnp.pad(C.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    else:
        cumdelta_p, c_p = cumdelta, C.astype(jnp.float32)
    kchunks = (l_loc + pad) // chunk

    def corr_body(_, xs):
        cd, cc = xs                                        # (B, c, D), (B, c, N)
        decay = jnp.exp(cd[:, :, None, :] * A32.T[None, None])  # (B, c, N, D)
        corr = jnp.einsum(
            "bcnd,bdn,bcn->bcd", decay, h0_local, cc,
            precision=jax.lax.Precision.HIGHEST,
        )
        return None, corr

    _, corr = lax.scan(
        corr_body, None,
        (
            cumdelta_p.reshape(bsz, kchunks, chunk, d).swapaxes(0, 1),
            c_p.reshape(bsz, kchunks, chunk, n).swapaxes(0, 1),
        ),
    )
    corr = corr.swapaxes(0, 1).reshape(bsz, kchunks * chunk, d)[:, :l_loc]

    out = y_loc + corr
    if D is not None:
        out = out + u.astype(jnp.float32) * D.astype(jnp.float32)[None, None, :]
    if z is not None:
        zf = z.astype(jnp.float32)
        out = out * (zf * jax.nn.sigmoid(zf))
    return out.astype(dtype_in), h_last_global
