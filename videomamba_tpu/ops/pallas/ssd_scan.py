"""Pallas TPU kernel for the SSD (Mamba-2) chunked scan.

The pure-XLA chunked SSD (ops/ssd.py ssd_core_chunked) is numerically exact
but materializes the (B, L, Q, H)-sized decay/attention factors in HBM —
at Base serving shapes (L=12544, Q=128, H=24) that is ~150 MB of float32
written and re-read several times per layer, and the measured chunk is
HBM-bound (64-97 ms vs a ~13 ms matmul floor). This kernel keeps every
(Q, Q) decay tile in VMEM and runs the whole chunk pipeline in one pass:

* Grid (B, L/Q): the chunk axis is the minor (sequential) grid dimension;
  the (H*P, N) float32 cross-chunk state lives in VMEM scratch — zero HBM
  traffic for the state or any intra-chunk factor.
* Per grid step, per head (Python-unrolled, static lane offsets):
    cb    = C_g @ B_g^T                      (MXU, shared across heads of a group)
    decay = exp(tril(s[q'] - s[k]))          (VPU, (Q, Q) in VMEM)
    y     = (cb * decay * dt[k]) @ x_h       (MXU)
          + (C_g * exp(s)) @ h_prev^T        (MXU)
    S_h   = (x_h * dt * exp(s_last - s))^T @ B_g   (MXU)
    h     = exp(s_last) * h_prev + S_h       (VPU, scratch)
* The decay logits (per-chunk inclusive cumsum of dt*A) are tiny (B, L, H)
  tensors precomputed in XLA and fed in both (L, H) and (H, L) layouts so
  the kernel needs no transposes.

Numerics match ssd_core_chunked: fp32 decay/cumsum/state, contractions in
x.dtype (bf16 in, bf16 MXU with fp32 accumulation), fp32 y out. The
backward is a custom_vjp that differentiates the XLA core (recompute) —
the forward is the serving hot path; training gradients ride the same
einsum-transpose backward either way.

No counterpart exists in the reference repo (Mamba-1 only; see ops/ssd.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array


def pallas_ssd_supported(nheads: int, hdim: int, ngroups: int, d_state: int,
                         chunk_size: int) -> bool:
    """Shape gate: lane-sliceable head/state widths, sublane-aligned chunks.

    On hardware the (H, chunk) decay-logit blocks put the chunk on the lane
    axis, so Mosaic requires chunk_size % 128 == 0; interpret mode (CPU
    tests) has no tiling rules and accepts any sublane-aligned chunk.
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    chunk_ok = (
        chunk_size % 8 == 0 and chunk_size >= 16
        if interpret_mode()
        else chunk_size % 128 == 0
    )
    return (
        hdim % 8 == 0
        and d_state % 8 == 0
        and chunk_ok
        and nheads % ngroups == 0
    )


def _ssd_kernel(
    *refs,
    # Ref layout (in order), [] = only in some variants:
    #   plain:      x (1,q,H*P)
    #   fuse_conv:  zx (1,q,DPJ), cstate (1,W,CD), convw (W,CD),
    #               convb (1,CD)
    #   always:     scol (1,q,H), srow (1,H,q), dtcol (1,q,H),
    #               dtrow (1,H,q), slast (B,nc,H) SMEM,
    #               [b (1,q,G*N), c (1,q,G*N) unless fuse_conv],
    #               h0 (1,H*P,N)
    #   fuse_conv epilogue: d (H,) SMEM, [norm w (1,H*P)]
    #   outputs: y, hlast; scratch: h (H*P,N) f32, [y acc (q,H*P) f32]
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    highest: bool,
    has_norm: bool = False,
    norm_eps: float = 1e-5,
    fuse_conv: bool = False,
    conv_width: int = 4,
    d_inner: int = 0,
    conv_dim: int = 0,
):
    it = iter(refs)
    if fuse_conv:
        zx_ref = next(it)
        cstate_ref = next(it)
        convw_ref = next(it)
        convb_ref = next(it)
        x_ref = None
    else:
        x_ref = next(it)
        zx_ref = None
    scol_ref = next(it)
    srow_ref = next(it)
    dtcol_ref = next(it)
    dtrow_ref = next(it)
    slast_ref = next(it)
    if not fuse_conv:
        b_ref = next(it)
        c_ref = next(it)
    h0_ref = next(it)
    d_ref = next(it) if fuse_conv else None
    w_ref = next(it) if (fuse_conv and has_norm) else None
    y_ref = next(it)
    hlast_ref = next(it)
    h_scr = next(it)
    y_scr = next(it) if fuse_conv else None
    xtail_scr = next(it) if fuse_conv else None  # (W-1, CD) raw conv tail

    c_idx = pl.program_id(1)
    n = d_state
    heads_per_group = nheads // ngroups
    prec = lax.Precision.HIGHEST if highest else None

    @pl.when(c_idx == 0)
    def _():
        h_scr[:] = h0_ref[0]

    if fuse_conv:
        # ---- causal depthwise conv + SiLU over the [x B C] slab, with the
        # previous chunk's tail (or the streaming window at chunk 0) as left
        # context — mixer_fused's prev-block trick.
        zx = zx_ref[0]                          # (q, DPJ)
        q = zx.shape[0]
        cdt = zx.dtype
        z_val = zx[:, :d_inner]
        raw = zx[:, d_inner:d_inner + conv_dim].astype(jnp.float32)
        state_tail = cstate_ref[0][1:, :].astype(jnp.float32)  # (W-1, CD)
        left = jnp.where(c_idx == 0, state_tail, xtail_scr[:])
        ctx = jnp.concatenate([left, raw], axis=0)
        xtail_scr[:] = raw[q - (conv_width - 1):]  # tail for the next chunk
        cw_taps = convw_ref[:].astype(jnp.float32)
        cy = cw_taps[conv_width - 1][None, :] * raw
        for k in range(conv_width - 1):
            cy = cy + cw_taps[k][None, :] * ctx[k:k + q]
        cy = cy + convb_ref[:].astype(jnp.float32)
        cy = cy * jax.nn.sigmoid(cy)            # silu, f32
        gn = conv_dim - d_inner                 # = 2 * G * N
        x = cy[:, :d_inner].astype(cdt)         # (q, H*P)
        bmat = cy[:, d_inner:d_inner + gn // 2].astype(cdt)
        cmat = cy[:, d_inner + gn // 2:].astype(cdt)
    else:
        x = x_ref[0]                       # (q, H*P)
        q = x.shape[0]
        cdt = x.dtype
        bmat = b_ref[0]                    # (q, G*N)
        cmat = c_ref[0]
        z_val = None
    scol = scol_ref[0]                 # (q, H)
    srow = srow_ref[0]                 # (H, q)
    dtcol = dtcol_ref[0]
    dtrow = dtrow_ref[0]

    ids_r = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    ids_c = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    causal = ids_r >= ids_c

    # Group-shared C @ B^T factors (MXU), fp32 accumulation.
    cbs = []
    for g in range(ngroups):
        bg = bmat[:, g * n:(g + 1) * n]
        cg = cmat[:, g * n:(g + 1) * n]
        cbs.append(
            lax.dot_general(
                cg, bg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        )  # (q, q)

    for h in range(nheads):
        g = h // heads_per_group
        sc = scol[:, h:h + 1]                     # (q, 1)
        sr = srow[h:h + 1, :]                     # (1, q)
        # Rank-0 scalar from SMEM: Mosaic has no (1,1)->(P,N) both-dims
        # broadcast, but scalar * array splats are free.
        slast = slast_ref[pl.program_id(0), c_idx, h]

        seg = jnp.where(causal, sc - sr, -jnp.inf)
        m = (cbs[g] * jnp.exp(seg) * dtrow[h:h + 1, :]).astype(cdt)  # (q, q)

        xh = x[:, h * hdim:(h + 1) * hdim]        # (q, P)
        y_h = lax.dot_general(
            m, xh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (q, P) intra-chunk

        h_prev = h_scr[h * hdim:(h + 1) * hdim, :]  # (P, N) f32
        cw = (
            cmat[:, g * n:(g + 1) * n].astype(jnp.float32) * jnp.exp(sc)
        ).astype(cdt)  # (q, N)
        y_h = y_h + lax.dot_general(
            cw, h_prev.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # + inter-chunk
        if fuse_conv:
            # D-skip folded here (scalar-per-head splat from SMEM).
            y_h = y_h + d_ref[h] * xh.astype(jnp.float32)
            y_scr[:, h * hdim:(h + 1) * hdim] = y_h
        else:
            y_ref[0, :, h * hdim:(h + 1) * hdim] = y_h

        # State update: S = (x * dt * exp(s_last - s))^T @ B, then decay+add.
        w = dtcol[:, h:h + 1] * jnp.exp(slast - sc)  # (q, 1)
        xw = (xh.astype(jnp.float32) * w).astype(cdt)
        s_h = lax.dot_general(
            xw, bmat[:, g * n:(g + 1) * n], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (P, N)
        h_scr[h * hdim:(h + 1) * hdim, :] = jnp.exp(slast) * h_prev + s_h

    if fuse_conv:
        # Epilogue in-VMEM: silu(z) gate (+ RMSNorm) — the XLA path's
        # _gate_and_project pre-out_proj stages, without the f32 HBM round
        # trip between them.
        gated = y_scr[:] * jax.nn.silu(z_val.astype(jnp.float32))
        if has_norm:
            var = jnp.mean(jnp.square(gated), axis=1, keepdims=True)
            # w_ref[:] is (1, H*P): sublane broadcast against (q, H*P).
            gated = gated * lax.rsqrt(var + norm_eps) * w_ref[:].astype(
                jnp.float32
            )
        y_ref[0] = gated.astype(y_ref.dtype)

    hlast_ref[0] = h_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret"),
)
def _ssd_pallas_padded(
    x: Array,        # (B, Lp, H*P), Lp % q == 0
    dt_p: Array,     # (B, Lp, H) f32 post-softplus (0 on padded rows)
    A: Array,        # (H,) f32 negative
    B: Array,        # (B, Lp, G*N)
    C: Array,        # (B, Lp, G*N)
    h0: Array,       # (B, H*P, N) f32
    *,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    chunk_size: int,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    bsz, lp, dinner = x.shape
    q = chunk_size
    nc = lp // q

    # Per-chunk inclusive decay cumsum — tiny (B, L, H) tensors in XLA.
    dtA = dt_p * A[None, None, :]
    s = jnp.cumsum(dtA.reshape(bsz, nc, q, nheads), axis=2)
    s = s.reshape(bsz, lp, nheads)
    srow = s.swapaxes(1, 2)          # (B, H, Lp)
    dtrow = dt_p.swapaxes(1, 2)
    s_last = s.reshape(bsz, nc, q, nheads)[:, :, -1, :]  # (B, nc, H)

    blk = lambda b, c: (b, c, 0)
    fixed = lambda b, c: (b, 0, 0)
    row = lambda b, c: (b, 0, c)
    grid = (bsz, nc)

    in_specs = [
        pl.BlockSpec((1, q, dinner), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), row, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # s_last, whole array
        pl.BlockSpec((1, q, ngroups * d_state), blk,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, ngroups * d_state), blk,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dinner, d_state), fixed,
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, s, srow, dt_p, dtrow, s_last, B, C, h0]
    scratch = [pltpu.VMEM((dinner, d_state), jnp.float32)]
    y_dtype = jnp.float32

    y, hlast = pl.pallas_call(
        functools.partial(
            _ssd_kernel, nheads=nheads, hdim=hdim, ngroups=ngroups,
            d_state=d_state, highest=(x.dtype == jnp.float32),
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, q, dinner), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dinner, d_state), fixed,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, dinner), y_dtype),
            jax.ShapeDtypeStruct((bsz, dinner, d_state), jnp.float32),
        ],
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return y, hlast


def _core_shim(x4, dt_p, A, B4, C4, h0, chunk_size):
    """XLA core with the same operand layout as the kernel's caller."""
    from videomamba_tpu.ops.ssd import ssd_core_chunked

    return ssd_core_chunked(x4, dt_p, A, B4, C4, h0, chunk_size=chunk_size)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ssd_pallas_core(x4, dt_p, A, B4, C4, h0, chunk_size, interpret):
    y, hlast = _ssd_pallas_fwd_impl(x4, dt_p, A, B4, C4, h0, chunk_size,
                                    interpret)
    return y, hlast


def _ssd_pallas_fwd_impl(x4, dt_p, A, B4, C4, h0, chunk_size, interpret):
    bsz, seqlen, nheads, hdim = x4.shape
    ngroups, n = B4.shape[2], B4.shape[3]
    q = int(chunk_size)
    pad = (-seqlen) % q
    xf = x4.reshape(bsz, seqlen, nheads * hdim)
    Bf = B4.reshape(bsz, seqlen, ngroups * n)
    Cf = C4.reshape(bsz, seqlen, ngroups * n)
    if pad:
        xf = jnp.pad(xf, ((0, 0), (0, pad), (0, 0)))
        Bf = jnp.pad(Bf, ((0, 0), (0, pad), (0, 0)))
        Cf = jnp.pad(Cf, ((0, 0), (0, pad), (0, 0)))
        dt_p = jnp.pad(dt_p, ((0, 0), (0, pad), (0, 0)))
    h0f = (
        h0.astype(jnp.float32).reshape(bsz, nheads * hdim, n)
        if h0 is not None
        else jnp.zeros((bsz, nheads * hdim, n), jnp.float32)
    )
    y, hlast = _ssd_pallas_padded(
        xf, dt_p.astype(jnp.float32), A.astype(jnp.float32), Bf, Cf, h0f,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        chunk_size=q, interpret=interpret,
    )
    y = y[:, :seqlen].reshape(bsz, seqlen, nheads, hdim)
    return y, hlast.reshape(bsz, nheads, hdim, n)


def _ssd_pallas_vjp_fwd(x4, dt_p, A, B4, C4, h0, chunk_size, interpret):
    out = _ssd_pallas_fwd_impl(x4, dt_p, A, B4, C4, h0, chunk_size, interpret)
    return out, (x4, dt_p, A, B4, C4, h0)

def _ssd_pallas_vjp_bwd(chunk_size, interpret, res, cts):
    x4, dt_p, A, B4, C4, h0 = res
    has_h0 = h0 is not None
    if not has_h0:
        h0 = jnp.zeros(
            (x4.shape[0], x4.shape[2], x4.shape[3], B4.shape[3]), jnp.float32
        )
    _, vjp = jax.vjp(
        lambda *args: _core_shim(*args, chunk_size=chunk_size), x4, dt_p, A,
        B4, C4, h0,
    )
    dx, ddt, dA, dB, dC, dh0 = vjp(cts)
    return dx, ddt, dA, dB, dC, (dh0 if has_h0 else None)


_ssd_pallas_core.defvjp(_ssd_pallas_vjp_fwd, _ssd_pallas_vjp_bwd)


def ssd_core_pallas(
    x4: Array,
    dt_p: Array,
    A: Array,
    B4: Array,
    C4: Array,
    initial_state: Optional[Array],
    chunk_size: int = 128,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Drop-in Pallas twin of :func:`videomamba_tpu.ops.ssd.ssd_core_chunked`.

    Same contract: x4 (B, L, H, P); dt_p post-softplus f32 (B, L, H);
    B4/C4 (B, L, G, N); returns (y f32 (B, L, H, P), h_last f32 (B,H,P,N)).
    Backward = custom_vjp through the XLA core (recompute).
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    return _ssd_pallas_core(
        x4, dt_p, A, B4, C4, initial_state, int(chunk_size), bool(interpret)
    )


# --------------------------------------- conv-fused (whole-mixer) variant


@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret", "norm_eps", "d_inner", "conv_dim"),
)
def _ssd_mixer_padded(
    zx: Array,       # (B, Lp, DPJ) in_proj output, Lp % q == 0
    dt_p: Array,     # (B, Lp, H) f32 post-softplus (0 on padded rows)
    A: Array,        # (H,) f32 negative
    cstate: Array,   # (B, W, conv_dim) raw-input window (time-major)
    convw: Array,    # (W, conv_dim)
    convb: Array,    # (1, conv_dim) f32
    h0: Array,       # (B, H*P, N) f32
    D: Array,        # (H,) f32
    norm_weight: Optional[Array],  # (1, H*P) f32 or None
    *,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    d_inner: int,
    conv_dim: int,
    chunk_size: int,
    interpret: bool = False,
    norm_eps: float = 1e-5,
) -> Tuple[Array, Array]:
    bsz, lp, dpj = zx.shape
    q = chunk_size
    nc = lp // q
    width = convw.shape[0]
    has_norm = norm_weight is not None

    dtA = dt_p * A[None, None, :]
    s = jnp.cumsum(dtA.reshape(bsz, nc, q, nheads), axis=2)
    s = s.reshape(bsz, lp, nheads)
    srow = s.swapaxes(1, 2)
    dtrow = dt_p.swapaxes(1, 2)
    s_last = s.reshape(bsz, nc, q, nheads)[:, :, -1, :]

    blk = lambda b, c: (b, c, 0)
    fixed = lambda b, c: (b, 0, 0)
    row = lambda b, c: (b, 0, c)
    fixed2 = lambda b, c: (0, 0)

    in_specs = [
        pl.BlockSpec((1, q, dpj), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((width, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), row, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # s_last
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # D (H,)
    ]
    operands = [zx, cstate, convw, convb, s, srow, dt_p, dtrow, s_last,
                h0, D.astype(jnp.float32)]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    y, hlast = pl.pallas_call(
        functools.partial(
            _ssd_kernel, nheads=nheads, hdim=hdim, ngroups=ngroups,
            d_state=d_state, highest=(zx.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps,
            fuse_conv=True, conv_width=width, d_inner=d_inner,
            conv_dim=conv_dim,
        ),
        grid=(bsz, nc),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, q, d_inner), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner, d_state), fixed,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, d_inner), zx.dtype),
            jax.ShapeDtypeStruct((bsz, d_inner, d_state), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((d_inner, d_state), jnp.float32),
            pltpu.VMEM((q, d_inner), jnp.float32),
            pltpu.VMEM((width - 1, conv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return y, hlast


def _mixer_fwd_impl(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
                    interpret):
    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    bsz, seqlen, _ = zx.shape
    q = int(chunk_size)
    pad = (-seqlen) % q
    zxf = jnp.pad(zx, ((0, 0), (0, pad), (0, 0))) if pad else zx
    dtf = jnp.pad(dt_p, ((0, 0), (0, pad), (0, 0))) if pad else dt_p
    h0f = (
        h0.astype(jnp.float32).reshape(bsz, nheads * hdim, n)
        if h0 is not None
        else jnp.zeros((bsz, nheads * hdim, n), jnp.float32)
    )
    cst = (
        cstate.astype(zx.dtype).swapaxes(1, 2)  # (B, D, W) -> (B, W, D)
        if cstate is not None
        else jnp.zeros((bsz, convw.shape[0], conv_dim), zx.dtype)
    )
    y, hlast = _ssd_mixer_padded(
        zxf, dtf.astype(jnp.float32), A.astype(jnp.float32), cst,
        convw, convb.astype(jnp.float32).reshape(1, conv_dim), h0f,
        D.astype(jnp.float32),
        (nw.astype(jnp.float32).reshape(1, d_inner) if nw is not None
         else None),
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        d_inner=d_inner, conv_dim=conv_dim, chunk_size=q,
        norm_eps=float(norm_eps), interpret=interpret,
    )
    return y[:, :seqlen], hlast.reshape(bsz, nheads, hdim, n)


def _mixer_xla_twin(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg):
    """XLA recompute of the conv-fused kernel (gradient path)."""
    from videomamba_tpu.ops.causal_conv1d import causal_conv1d
    from videomamba_tpu.ops.norm import rms_norm
    from videomamba_tpu.ops.ssd import ssd_core_chunked

    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    bsz, seqlen, _ = zx.shape
    z2 = zx[..., :d_inner]
    raw = zx[..., d_inner:d_inner + conv_dim]
    xbc = causal_conv1d(raw, convw, convb, activation="silu",
                        initial_state=cstate)
    gn = ngroups * n
    x4 = xbc[..., :d_inner].reshape(bsz, seqlen, nheads, hdim)
    B4 = xbc[..., d_inner:d_inner + gn].reshape(bsz, seqlen, ngroups, n)
    C4 = xbc[..., d_inner + gn:].reshape(bsz, seqlen, ngroups, n)
    y, hlast = ssd_core_chunked(x4, dt_p, A, B4, C4, h0,
                                chunk_size=chunk_size)
    y = y + D.astype(jnp.float32)[None, None, :, None] * x4.astype(
        jnp.float32
    )
    y = y.reshape(bsz, seqlen, d_inner)
    gated = y * jax.nn.silu(z2.astype(jnp.float32))
    if nw is not None:
        gated = rms_norm(gated, nw, eps=norm_eps)
    return gated.astype(zx.dtype), hlast


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _ssd_mixer_core(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
                    interpret):
    return _mixer_fwd_impl(zx, dt_p, A, cstate, convw, convb, h0, D, nw,
                           cfg, interpret)


def _mixer_vjp_fwd(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
                   interpret):
    out = _mixer_fwd_impl(zx, dt_p, A, cstate, convw, convb, h0, D, nw,
                          cfg, interpret)
    return out, (zx, dt_p, A, cstate, convw, convb, h0, D, nw)


def _mixer_vjp_bwd(cfg, interpret, res, cts):
    zx, dt_p, A, cstate, convw, convb, h0, D, nw = res
    nheads, hdim, ngroups, n, d_inner, conv_dim, _, _ = cfg
    bsz = zx.shape[0]
    has_h0 = h0 is not None
    if not has_h0:
        h0 = jnp.zeros((bsz, nheads, hdim, n), jnp.float32)
    has_cst = cstate is not None
    if not has_cst:
        cstate = jnp.zeros((bsz, conv_dim, convw.shape[0]), zx.dtype)
    has_nw = nw is not None
    diff = (zx, dt_p, A, cstate, convw, convb, h0, D) + (
        (nw,) if has_nw else ()
    )

    def f(*args):
        if has_nw:
            *head, w = args
            return _mixer_xla_twin(*head, w, cfg)
        return _mixer_xla_twin(*args, None, cfg)

    _, vjp = jax.vjp(f, *diff)
    grads = vjp(cts)
    if has_nw:
        dzx, ddt, dA, dcst, dcw, dcb, dh0, dD, dnw = grads
    else:
        dzx, ddt, dA, dcst, dcw, dcb, dh0, dD = grads
        dnw = None
    return (dzx, ddt, dA, (dcst if has_cst else None), dcw, dcb,
            (dh0 if has_h0 else None), dD, dnw)


_ssd_mixer_core.defvjp(_mixer_vjp_fwd, _mixer_vjp_bwd)


def ssd_mixer_pallas(
    zxbcdt: Array,
    A: Array,
    conv_weight: Array,
    conv_bias: Optional[Array],
    D: Array,
    dt_bias: Optional[Array],
    initial_state: Optional[Array] = None,
    conv_state: Optional[Array] = None,
    norm_weight: Optional[Array] = None,
    norm_eps: float = 1e-5,
    chunk_size: int = 128,
    nheads: int = 0,
    hdim: int = 0,
    ngroups: int = 1,
    d_state: int = 0,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """The whole Mamba-2 mixer core in ONE kernel: causal conv + SiLU over
    the [x B C] slab (streaming window honored), SSD scan, D-skip, silu(z)
    gate, gated RMSNorm. In: the raw in_proj output ``zxbcdt``
    (B, L, 2*d_inner + 2*G*N + H); out: ``(out_proj input (B, L, d_inner),
    h_last f32 (B, H, P, N))``.

    Removes the conv (0.43 ms/layer) and zxbcdt-split (0.19 ms/layer) XLA
    HBM passes the gated variant still paid at Base serving shapes.
    """
    from videomamba_tpu.ops.dispatch import interpret_mode
    from videomamba_tpu.ops.ssd import _prepare_dt

    if interpret_mode():
        interpret = True
    d_inner = nheads * hdim
    conv_dim = d_inner + 2 * ngroups * d_state
    dt_raw = zxbcdt[..., 2 * d_inner + 2 * ngroups * d_state:]
    dt_p = _prepare_dt(dt_raw, dt_bias, True)
    cb = (
        conv_bias if conv_bias is not None
        else jnp.zeros((conv_dim,), jnp.float32)
    )
    cfg = (int(nheads), int(hdim), int(ngroups), int(d_state),
           int(d_inner), int(conv_dim), int(chunk_size), float(norm_eps))
    return _ssd_mixer_core(
        zxbcdt, dt_p, A.astype(jnp.float32), conv_state, conv_weight, cb,
        initial_state, D.astype(jnp.float32), norm_weight, cfg,
        bool(interpret),
    )
