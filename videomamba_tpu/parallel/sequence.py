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

from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

from videomamba_tpu.ops.selective_scan import (
    _prepare_delta,
    selective_scan_bld,
)

Array = jax.Array
Params = Dict[str, Any]
LayerState = Tuple[Array, Array]


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


def sequence_parallel_mixer(
    mixer,
    params: Params,
    hidden_states: Array,
    axis_name: str = "sp",
    state: Optional[LayerState] = None,
    return_state: bool = False,
    ssm_state: Optional[Array] = None,
    return_ssm_state: bool = False,
    method: Optional[str] = None,
) -> Union[Array, Tuple[Array, LayerState]]:
    """Full Mamba mixer over a time-sharded sequence (call inside shard_map).

    The device-local pieces (in_proj, depthwise conv, x/dt projections,
    gate, out_proj) run unmodified on each shard; the two cross-shard
    couplings are handled explicitly:

    * conv halo — each shard's last ``d_conv`` raw conv inputs ride one
      ``lax.ppermute`` hop to the next shard, which uses them as its carried
      conv window (shard 0 takes the streaming ``conv_state`` or zeros);
    * the recurrence — :func:`sequence_parallel_scan` (one all-gather of
      (segment_decay, h_local) pairs per layer, O(1) in L).

    Same contract as ``Mamba.__call__`` with ``hidden_states`` being the
    local (B, L/sp, d_model) shard: returns ``out`` or
    ``(out, (new_conv_state, new_ssm_state))`` where the returned states are
    the *global-sequence* states, replicated across the sp axis (so chunked
    streaming can resume from them on any layout).

    Autodiff: every cross-shard op (ppermute, all_gather, the static-length
    combine loop) is reverse-differentiable; gradients match the
    single-device mixer (tested in tests/test_sequence_parallel.py).
    """
    conv_state = None
    if state is not None:
        conv_state, ssm_state = state

    w = params["conv1d"]["weight"].shape[0]
    l_loc = hidden_states.shape[1]
    if l_loc < w:
        raise ValueError(
            f"sequence-parallel shard length {l_loc} must be >= d_conv {w}"
        )

    xz = hidden_states @ params["in_proj"]["kernel"]
    if "bias" in params["in_proj"]:
        xz = xz + params["in_proj"]["bias"]
    x, z = jnp.split(xz, 2, axis=-1)

    # Conv halo: my last-w-inputs window -> next shard's carried window.
    num = lax.axis_size(axis_name)
    local_window = x[:, -w:].swapaxes(1, 2)  # (B, d_inner, w)
    if num > 1:
        perm = [(i, i + 1) for i in range(num - 1)]
        prev_window = lax.ppermute(local_window, axis_name, perm)
    else:
        prev_window = jnp.zeros_like(local_window)
    if conv_state is not None:
        is_first = lax.axis_index(axis_name) == 0
        prev_window = jnp.where(
            is_first, conv_state.astype(prev_window.dtype), prev_window
        )

    from videomamba_tpu.ops.causal_conv1d import causal_conv1d

    conv_out = causal_conv1d(
        x,
        params["conv1d"]["weight"],
        params["conv1d"].get("bias"),
        activation="silu",
        initial_state=prev_window,
    )

    x_dbl = conv_out @ params["x_proj"]["kernel"]
    r, n = mixer.dt_rank_, mixer.d_state
    dt = x_dbl[..., :r] @ params["dt_proj"]["kernel"]
    B_ssm = x_dbl[..., r:r + n]
    C_ssm = x_dbl[..., r + n:]
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    y, h_last = sequence_parallel_scan(
        conv_out,
        dt,
        A,
        B_ssm,
        C_ssm,
        D=params["D"].astype(jnp.float32),
        z=z,
        delta_bias=params["dt_proj"]["bias"].astype(jnp.float32),
        delta_softplus=True,
        initial_state=ssm_state,
        axis_name=axis_name,
        method=method or "chunked",
    )

    out = y @ params["out_proj"]["kernel"]
    if "bias" in params["out_proj"]:
        out = out + params["out_proj"]["bias"]

    if not return_state and not return_ssm_state:
        return out

    new_ssm_state = (
        h_last.astype(ssm_state.dtype) if ssm_state is not None else h_last
    )
    if return_ssm_state:
        # Functional stand-in for the reference's in-place advancement
        # (mamba_simple.py:419-439): bare advanced SSM state, no conv window.
        return out, new_ssm_state

    # Global-sequence states, replicated: conv window of the LAST shard,
    # h_last is already replicated by the scan's combine.
    new_conv_state = lax.all_gather(local_window, axis_name)[num - 1]
    if conv_state is not None:
        new_conv_state = new_conv_state.astype(conv_state.dtype)
    return out, (new_conv_state, new_ssm_state)


# ---------------------------------------------------------------------------
# Mamba-2 (SSD): the scalar-per-head decay makes sequence parallelism CHEAPER
# than Mamba-1's — a segment's total decay is exp(A_h * sum_t dt_t) per head
# ((B, H) floats vs Mamba-1's (B, D, N)), and the entry-state correction is
# one einsum with no chunking (no (c, D, N) transient to bound).
# ---------------------------------------------------------------------------


def sequence_parallel_ssd(
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
    axis_name: str = "sp",
    chunk_size: int = 64,
    method: str = "chunked",
) -> Tuple[Array, Array]:
    """SSD scan over a time-sharded sequence (call inside shard_map).

    Args are the local shards, layouts as in ``ssd_chunked``
    (x: (B, L_loc, H, P); dt: (B, L_loc, H); A: (H,); B/C: (B, L_loc, G, N);
    initial_state: (B, H, P, N), meaningful on the axis-0 device).

    Returns:
        (out_local (B, L_loc, H, P) in x.dtype — this device's output slice,
         h_last_global (B, H, P, N) float32 — post-sequence state, replicated).
    """
    from videomamba_tpu.ops.ssd import (
        _expand_groups,
        _finish,
        _prepare_dt,
        ssd_chunked,
    )

    dtype_in = x.dtype
    bsz, l_loc, nheads, hdim = x.shape
    n = B.shape[-1]
    A32 = A.astype(jnp.float32)

    # Prepare dt once (bias + softplus) so the local scan, segment decay,
    # and closed-form correction agree exactly.
    dt_p = _prepare_dt(dt, dt_bias, dt_softplus)  # (B, L_loc, H) fp32

    # 1. Local scan from zero state, raw outputs (D-skip/gate after the
    #    cross-device correction).
    y_loc, h_loc = ssd_chunked(
        x.astype(jnp.float32), dt_p, A32, B, C,
        D=None, z=None, dt_bias=None, dt_softplus=False,
        initial_state=None, return_last_state=True,
        chunk_size=chunk_size, method=method,
    )

    # 2. Segment decay in closed form — scalar per head.
    seg_decay = jnp.exp(A32[None] * jnp.sum(dt_p, axis=1))  # (B, H)

    # 3. Exclusive prefix combine across the sp axis.
    k = lax.axis_index(axis_name)
    num = lax.axis_size(axis_name)
    decays = lax.all_gather(seg_decay, axis_name)           # (K, B, H)
    h_locs = lax.all_gather(h_loc, axis_name)               # (K, B, H, P, N)

    h_init = (
        jnp.zeros((bsz, nheads, hdim, n), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )

    def combine(i, h):
        seg = decays[i][:, :, None, None] * h + h_locs[i]
        return jnp.where(i < k, seg, h)

    h0_local = lax.fori_loop(0, num, combine, h_init)       # (B, H, P, N)

    def combine_all(i, h):
        return decays[i][:, :, None, None] * h + h_locs[i]

    h_last_global = lax.fori_loop(0, num, combine_all, h_init)

    # 4. Closed-form correction, one einsum:
    #    y[b,l,h,:] += exp(A_h * cumdt[b,l,h]) * (C[b,l,g(h)] . h0[b,h,:,:]^T)
    cumdt = jnp.cumsum(dt_p, axis=1)                        # (B, L_loc, H)
    decay_t = jnp.exp(cumdt * A32[None, None])              # (B, L_loc, H)
    Ch = _expand_groups(C.astype(jnp.float32), nheads)      # (B, L_loc, H, N)
    corr = jnp.einsum(
        "blhn,bhpn->blhp", Ch, h0_local,
        precision=lax.Precision.HIGHEST,
    )
    y = y_loc + decay_t[..., None] * corr
    out = _finish(y, x, D, z, dtype_in)
    return out, h_last_global


def sequence_parallel_mixer_m2(
    mixer,
    params: Params,
    hidden_states: Array,
    axis_name: str = "sp",
    state: Optional[LayerState] = None,
    return_state: bool = False,
    ssm_state: Optional[Array] = None,
    return_ssm_state: bool = False,
) -> Union[Array, Tuple[Array, LayerState], Tuple[Array, Array]]:
    """Full Mamba-2 mixer over a time-sharded sequence (call inside shard_map).

    Mirrors :func:`sequence_parallel_mixer` for the SSD family: the
    device-local pieces (in_proj, depthwise conv over the [x B C] slab,
    gated RMSNorm, out_proj) run unmodified on each shard; the conv halo
    rides one ``lax.ppermute`` hop and the recurrence combine is
    :func:`sequence_parallel_ssd`. Same contract as ``Mamba2.__call__`` with
    ``hidden_states`` the local (B, L/sp, d_model) shard; returned states are
    the global-sequence states, replicated across the sp axis.
    """
    conv_state = None
    if state is not None:
        conv_state, ssm_state = state

    w = params["conv1d"]["weight"].shape[0]
    bsz, l_loc, _ = hidden_states.shape
    if l_loc < w:
        raise ValueError(
            f"sequence-parallel shard length {l_loc} must be >= d_conv {w}"
        )

    zxbcdt = hidden_states @ params["in_proj"]["kernel"]
    if "bias" in params["in_proj"]:
        zxbcdt = zxbcdt + params["in_proj"]["bias"]
    z, xBC, dt = mixer._split_zxbcdt(zxbcdt)

    # Conv halo over the raw [x B C] slab.
    num = lax.axis_size(axis_name)
    local_window = xBC[:, -w:].swapaxes(1, 2)  # (B, conv_dim, w)
    if num > 1:
        perm = [(i, i + 1) for i in range(num - 1)]
        prev_window = lax.ppermute(local_window, axis_name, perm)
    else:
        prev_window = jnp.zeros_like(local_window)
    if conv_state is not None:
        is_first = lax.axis_index(axis_name) == 0
        prev_window = jnp.where(
            is_first, conv_state.astype(prev_window.dtype), prev_window
        )

    from videomamba_tpu.ops.causal_conv1d import causal_conv1d

    xBC = causal_conv1d(
        xBC,
        params["conv1d"]["weight"],
        params["conv1d"].get("bias"),
        activation="silu",
        initial_state=prev_window,
    )

    x, B, C = mixer._split_xbc(xBC)
    h, p, g, n = mixer.nheads, mixer.headdim, mixer.ngroups, mixer.d_state
    x = x.reshape(bsz, l_loc, h, p)
    B = B.reshape(bsz, l_loc, g, n)
    C = C.reshape(bsz, l_loc, g, n)
    A = -jnp.exp(params["A_log"].astype(jnp.float32))

    y, h_last = sequence_parallel_ssd(
        x, dt, A, B, C,
        D=params["D"],
        dt_bias=params["dt_bias"],
        dt_softplus=True,
        initial_state=ssm_state,
        axis_name=axis_name,
        chunk_size=mixer.chunk_size,
    )
    y = y.reshape(bsz, l_loc, mixer.d_inner)

    out = mixer._gate_and_project(params, y, z)

    if not return_state and not return_ssm_state:
        return out

    new_ssm_state = (
        h_last.astype(ssm_state.dtype) if ssm_state is not None else h_last
    )
    if return_ssm_state:
        return out, new_ssm_state

    new_conv_state = lax.all_gather(local_window, axis_name)[num - 1]
    if conv_state is not None:
        new_conv_state = new_conv_state.astype(conv_state.dtype)
    return out, (new_conv_state, new_ssm_state)
