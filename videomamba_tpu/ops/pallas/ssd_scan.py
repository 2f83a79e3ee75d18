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
x.dtype (bf16 in, bf16 MXU with fp32 accumulation), fp32 y out.

Three entry points:
* :func:`ssd_core_pallas` — the bare scan, drop-in for ssd_core_chunked.
* :func:`ssd_mixer_pallas` — the whole Mamba-2 mixer core between the
  projections: causal conv + SiLU over the [x B C] slab (streaming window
  honored via a conv-tail scratch carry), scan, D-skip, silu(z) gate,
  gated RMSNorm — ONE kernel, one HBM read of the in_proj output.
* Training backward — a hand-written reverse-chunk Pallas kernel
  (:func:`_ssd_bwd_padded`): the forward checkpoints per-chunk entry
  states (and, on the mixer path, the pre-gate y), the backward carries
  dL/dstate in VMEM scratch and emits every cotangent with per-head MXU
  contractions; only the tiny decay-logit cumsum chains run in XLA.

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
    checkpoints: bool = False,
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
    hins_ref = next(it) if checkpoints else None
    yd_ref = next(it) if (checkpoints and fuse_conv) else None
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

    if checkpoints:
        # Residual for the backward kernel: the state ENTERING this chunk.
        hins_ref[0, 0] = h_scr[:]

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
        if checkpoints:
            # Pre-gate y (scan + D-skip): the backward's epilogue residual.
            yd_ref[0] = y_scr[:].astype(yd_ref.dtype)
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
                     "interpret", "checkpoints"),
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
    checkpoints: bool = False,
):
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

    out_specs = [
        pl.BlockSpec((1, q, dinner), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, dinner, d_state), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, dinner), y_dtype),
        jax.ShapeDtypeStruct((bsz, dinner, d_state), jnp.float32),
    ]
    if checkpoints:
        out_specs.append(
            pl.BlockSpec((1, 1, dinner, d_state), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, nc, dinner, d_state), jnp.float32)
        )

    outs = pl.pallas_call(
        functools.partial(
            _ssd_kernel, nheads=nheads, hdim=hdim, ngroups=ngroups,
            d_state=d_state, highest=(x.dtype == jnp.float32),
            checkpoints=checkpoints,
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    return outs if checkpoints else (outs[0], outs[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ssd_pallas_core(x4, dt_p, A, B4, C4, h0, chunk_size, interpret):
    y, hlast = _ssd_pallas_fwd_impl(x4, dt_p, A, B4, C4, h0, chunk_size,
                                    interpret)
    return y, hlast


def _pad_core_operands(x4, dt_p, B4, C4, h0, q):
    bsz, seqlen, nheads, hdim = x4.shape
    ngroups, n = B4.shape[2], B4.shape[3]
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
    return xf, dt_p.astype(jnp.float32), Bf, Cf, h0f


def _ssd_pallas_fwd_impl(x4, dt_p, A, B4, C4, h0, chunk_size, interpret):
    bsz, seqlen, nheads, hdim = x4.shape
    ngroups, n = B4.shape[2], B4.shape[3]
    q = int(chunk_size)
    xf, dtf, Bf, Cf, h0f = _pad_core_operands(x4, dt_p, B4, C4, h0, q)
    y, hlast = _ssd_pallas_padded(
        xf, dtf, A.astype(jnp.float32), Bf, Cf, h0f,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        chunk_size=q, interpret=interpret,
    )
    y = y[:, :seqlen].reshape(bsz, seqlen, nheads, hdim)
    return y, hlast.reshape(bsz, nheads, hdim, n)


def _ssd_pallas_vjp_fwd(x4, dt_p, A, B4, C4, h0, chunk_size, interpret):
    bsz, seqlen, nheads, hdim = x4.shape
    ngroups, n = B4.shape[2], B4.shape[3]
    q = int(chunk_size)
    xf, dtf, Bf, Cf, h0f = _pad_core_operands(x4, dt_p, B4, C4, h0, q)
    y, hlast, hins = _ssd_pallas_padded(
        xf, dtf, A.astype(jnp.float32), Bf, Cf, h0f,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        chunk_size=q, interpret=interpret, checkpoints=True,
    )
    out = (
        y[:, :seqlen].reshape(bsz, seqlen, nheads, hdim),
        hlast.reshape(bsz, nheads, hdim, n),
    )
    return out, (xf, dtf, Bf, Cf, hins, A, h0)


def _ssd_pallas_vjp_bwd(chunk_size, interpret, res, cts):
    xf, dtf, Bf, Cf, hins, A, h0 = res
    dy4, dhlast = cts
    bsz, seqlen, nheads, hdim = dy4.shape
    n = hins.shape[-1]
    ngroups = Bf.shape[-1] // n
    q = int(chunk_size)
    lp = xf.shape[1]
    dyf = dy4.astype(jnp.float32).reshape(bsz, seqlen, nheads * hdim)
    if lp != seqlen:
        dyf = jnp.pad(dyf, ((0, 0), (0, lp - seqlen), (0, 0)))
    dhl = dhlast.astype(jnp.float32).reshape(bsz, nheads * hdim, n)

    (dxf, dBf, dCf, ds_col, ds_row, ddtp_col, ddtp_row,
     dh0f) = _ssd_bwd_padded(
        xf, dtf, A.astype(jnp.float32), Bf, Cf, hins, dyf, dhl,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        chunk_size=q, interpret=interpret,
    )

    # Small-tensor decay chains in XLA: s = within-chunk cumsum(dt*A), so
    # d(dtA) = reversed within-chunk cumsum of ds; dA and the dt_p terms
    # follow by the product rule.
    nc = lp // q
    ds = ds_col + ds_row.swapaxes(1, 2)
    ds_c = ds.reshape(bsz, nc, q, nheads)
    ddtA = jnp.flip(jnp.cumsum(jnp.flip(ds_c, 2), axis=2), 2)
    ddtA = ddtA.reshape(bsz, lp, nheads)
    ddtp = ddtp_col + ddtp_row.swapaxes(1, 2) + ddtA * A[None, None, :]
    dA = jnp.sum(ddtA * dtf, axis=(0, 1))

    # Cotangents must match primal dtypes (bf16 activations in training).
    dx = dxf[:, :seqlen].reshape(bsz, seqlen, nheads, hdim).astype(xf.dtype)
    dB = dBf[:, :seqlen].reshape(bsz, seqlen, ngroups, n).astype(Bf.dtype)
    dC = dCf[:, :seqlen].reshape(bsz, seqlen, ngroups, n).astype(Cf.dtype)
    ddtp = ddtp[:, :seqlen].astype(dtf.dtype)
    dh0 = (
        dh0f.reshape(bsz, nheads, hdim, n).astype(h0.dtype)
        if h0 is not None else None
    )
    return dx, ddtp, dA, dB, dC, dh0


_ssd_pallas_core.defvjp(_ssd_pallas_vjp_fwd, _ssd_pallas_vjp_bwd)


def _ssd_bwd_kernel(
    # inputs (all chunk-indexed refs use REVERSED index maps):
    x_ref,       # (1, q, H*P)
    dy_ref,      # (1, q, H*P) f32
    scol_ref,    # (1, q, H) f32
    srow_ref,    # (1, H, q) f32
    dtcol_ref,   # (1, q, H) f32
    dtrow_ref,   # (1, H, q) f32
    slast_ref,   # (B, nc, H) f32 SMEM (absolute chunk index)
    b_ref,       # (1, q, G*N)
    c_ref,       # (1, q, G*N)
    hins_ref,    # (1, 1, H*P, N) f32: state ENTERING this chunk (fwd ckpt)
    dhlast_ref,  # (1, H*P, N) f32
    # outputs
    dx_ref,      # (1, q, H*P) f32
    db_ref,      # (1, q, G*N) f32
    dc_ref,      # (1, q, G*N) f32
    dscol_ref,   # (1, q, H) f32   row-indexed ds contributions
    dsrow_ref,   # (1, H, q) f32   col-indexed ds contributions
    ddtpcol_ref,  # (1, q, H) f32
    ddtprow_ref,  # (1, H, q) f32
    dh0_ref,     # (1, H*P, N) f32
    # scratch
    g_scr,       # (H*P, N) f32: dL/d(state leaving current chunk)
    *,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    nc: int,
    highest: bool,
):
    c_idx = pl.program_id(1)
    chunk = nc - 1 - c_idx  # absolute chunk index (reverse iteration)
    n = d_state
    heads_per_group = nheads // ngroups
    prec = lax.Precision.HIGHEST if highest else None

    @pl.when(c_idx == 0)
    def _():
        g_scr[:] = dhlast_ref[0]

    x = x_ref[0]
    q = x.shape[0]
    cdt = x.dtype
    dy = dy_ref[0]                      # (q, H*P) f32
    scol = scol_ref[0]
    srow = srow_ref[0]
    dtcol = dtcol_ref[0]
    dtrow = dtrow_ref[0]
    bmat = b_ref[0]
    cmat = c_ref[0]
    hin = hins_ref[0, 0]                # (H*P, N) f32

    ids_r = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    ids_c = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    causal = ids_r >= ids_c

    # Zero the accumulating output blocks (fresh VMEM each grid step).
    db_ref[0] = jnp.zeros((q, ngroups * n), jnp.float32)
    dc_ref[0] = jnp.zeros((q, ngroups * n), jnp.float32)
    dscol_ref[0] = jnp.zeros((q, nheads), jnp.float32)
    dsrow_ref[0] = jnp.zeros((nheads, q), jnp.float32)
    ddtpcol_ref[0] = jnp.zeros((q, nheads), jnp.float32)
    ddtprow_ref[0] = jnp.zeros((nheads, q), jnp.float32)

    cbs = []
    for g in range(ngroups):
        bg = bmat[:, g * n:(g + 1) * n]
        cg = cmat[:, g * n:(g + 1) * n]
        cbs.append(
            lax.dot_general(
                cg, bg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        )

    for h in range(nheads):
        g = h // heads_per_group
        gsl = slice(g * n, (g + 1) * n)
        hsl = slice(h * hdim, (h + 1) * hdim)
        sc = scol[:, h:h + 1]
        sr = srow[h:h + 1, :]
        slast = slast_ref[pl.program_id(0), chunk, h]
        dtr = dtrow[h:h + 1, :]

        e_seg = jnp.where(causal, sc - sr, -jnp.inf)
        E = jnp.exp(e_seg)              # (q, q) f32, zero above diagonal
        dy_h = dy[:, hsl]               # (q, P) f32
        dy_c = dy_h.astype(cdt)
        xh = x[:, hsl]                  # (q, P) cdt
        hin_h = hin[hsl, :]             # (P, N) f32
        g_h = g_scr[hsl, :]             # (P, N) f32

        # ---- intra-chunk: y = (cb*E*dt) @ x
        M = (cbs[g] * E * dtr).astype(cdt)
        dx_h = lax.dot_general(
            M, dy_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (q_k, P)
        dM = lax.dot_general(
            dy_c, xh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (q_i, q_k)
        dDm = dM * cbs[g]               # grad wrt (E * dt) factor
        T = dDm * E                     # ddt collector (before dt factor)
        ddtprow_ref[0, h:h + 1, :] += jnp.sum(T, axis=0, keepdims=True).astype(
            jnp.float32
        )
        U = T * dtr
        dscol_ref[0, :, h:h + 1] += jnp.sum(U, axis=1, keepdims=True)
        dsrow_ref[0, h:h + 1, :] += -jnp.sum(U, axis=0, keepdims=True)
        dcb = (dM * E * dtr).astype(cdt)
        dc_ref[0, :, gsl] += lax.dot_general(
            dcb, bmat[:, gsl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        db_ref[0, :, gsl] += lax.dot_general(
            dcb, cmat[:, gsl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        # ---- inter-chunk y: y += (C * exp(s)) @ h_in^T
        exp_sc = jnp.exp(sc)            # (q, 1)
        cw = cmat[:, gsl].astype(jnp.float32) * exp_sc  # (q, N) f32
        dCw = lax.dot_general(
            dy_c, hin_h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (q, N)
        dc_ref[0, :, gsl] += dCw * exp_sc
        dscol_ref[0, :, h:h + 1] += jnp.sum(dCw * cw, axis=1, keepdims=True)
        dhin = lax.dot_general(
            dy_c, cw.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (P, N): y-path grad into the incoming state

        # ---- state path: h_out = exp(slast) h_in + (x*dt*exp(slast-s))^T B
        w = dtcol[:, h:h + 1] * jnp.exp(slast - sc)  # (q, 1)
        R = lax.dot_general(
            bmat[:, gsl], g_h.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (q, P)
        dx_h = dx_h + w * R
        dw = jnp.sum(xh.astype(jnp.float32) * R, axis=1, keepdims=True)
        ddtpcol_ref[0, :, h:h + 1] += dw * jnp.exp(slast - sc)
        dscol_ref[0, :, h:h + 1] += -(dw * w)
        xw = (xh.astype(jnp.float32) * w).astype(cdt)
        db_ref[0, :, gsl] += lax.dot_general(
            xw, g_h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dslast = jnp.sum(dw * w) + jnp.exp(slast) * jnp.sum(g_h * hin_h)
        dsrow_ref[0, h:h + 1, q - 1:q] += dslast

        dx_ref[0, :, hsl] = dx_h
        g_scr[hsl, :] = dhin + jnp.exp(slast) * g_h

    dh0_ref[0] = g_scr[:]


@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret"),
)
def _ssd_bwd_padded(
    x: Array,        # (B, Lp, H*P)
    dt_p: Array,     # (B, Lp, H) f32
    A: Array,        # (H,) f32
    B: Array,        # (B, Lp, G*N)
    C: Array,        # (B, Lp, G*N)
    hins: Array,     # (B, nc, H*P, N) f32
    dy: Array,       # (B, Lp, H*P) f32
    dhlast: Array,   # (B, H*P, N) f32
    *,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    chunk_size: int,
    interpret: bool = False,
):
    bsz, lp, dinner = x.shape
    q = chunk_size
    nc = lp // q

    dtA = dt_p * A[None, None, :]
    s = jnp.cumsum(dtA.reshape(bsz, nc, q, nheads), axis=2)
    s = s.reshape(bsz, lp, nheads)
    srow = s.swapaxes(1, 2)
    dtrow = dt_p.swapaxes(1, 2)
    s_last = s.reshape(bsz, nc, q, nheads)[:, :, -1, :]

    # Reversed index maps: grid step c processes absolute chunk nc-1-c.
    rblk = lambda b, c: (b, nc - 1 - c, 0)
    rrow = lambda b, c: (b, 0, nc - 1 - c)
    rchunk = lambda b, c: (b, nc - 1 - c, 0, 0)
    fixed = lambda b, c: (b, 0, 0)
    gn = ngroups * d_state

    outs = pl.pallas_call(
        functools.partial(
            _ssd_bwd_kernel, nheads=nheads, hdim=hdim, ngroups=ngroups,
            d_state=d_state, nc=nc, highest=(x.dtype == jnp.float32),
        ),
        grid=(bsz, nc),
        in_specs=[
            pl.BlockSpec((1, q, dinner), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, dinner), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # s_last
            pl.BlockSpec((1, q, gn), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, gn), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dinner, d_state), rchunk,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dinner, d_state), fixed,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, q, dinner), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, gn), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, gn), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dinner, d_state), fixed,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lp, dinner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, gn), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, gn), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),
            jax.ShapeDtypeStruct((bsz, dinner, d_state), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((dinner, d_state), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, dy, s, srow, dt_p, dtrow, s_last, B, C, hins, dhlast)
    return outs


def _ssd_mixer_bwd_kernel(
    # inputs (chunk-indexed refs use REVERSED index maps)
    zx_ref,      # (1, q, DPJ) in_proj output (current chunk)
    zxprev_ref,  # (1, q, DPJ) previous chunk (conv left context)
    cstate_ref,  # (1, W, CD) streaming conv window
    convw_ref,   # (W, CD)
    convb_ref,   # (1, CD) f32
    yd_ref,      # (1, q, DI) f32 pre-gate y checkpoint (scan + D-skip)
    dout_ref,    # (1, q, DI) cotangent of the gated/normed output
    scol_ref,    # (1, q, H) f32
    srow_ref,    # (1, H, q) f32
    dtcol_ref,   # (1, q, H) f32
    dtrow_ref,   # (1, H, q) f32
    slast_ref,   # (B, nc, H) f32 SMEM (absolute chunk index)
    hins_ref,    # (1, 1, DI, N) f32 state ENTERING this chunk
    dhlast_ref,  # (1, DI, N) f32
    d_ref,       # (H,) f32 SMEM
    *maybe_nw_and_outs,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    nc: int,
    highest: bool,
    has_norm: bool,
    norm_eps: float,
    conv_width: int,
    d_inner: int,
    conv_dim: int,
):
    """Whole-mixer-core backward in ONE kernel.

    Replaces the composite backward's XLA glue (conv recompute + vjp,
    epilogue vjp, D-skip split, dxbc/dzx concatenates — measured 1.8
    ms/layer at Base train shapes, more than the two Pallas kernels
    combined) with in-VMEM recompute: conv+SiLU from the zx block, gate/
    RMSNorm backward at the stored pre-gate y, the reverse-chunk scan
    backward, and the conv backward, emitting ``dzx`` directly.

    Mirrors mixer_bwd.py's structure for Mamba-1 (the reference's fused
    ``mamba_inner_fn`` backward role, mamba_simple.py:343-435).
    """
    it = iter(maybe_nw_and_outs)
    nw_ref = next(it) if has_norm else None
    # outputs
    dzx_ref = next(it)      # (1, q, DPJ)
    dscol_ref = next(it)    # (1, q, H) f32
    dsrow_ref = next(it)    # (1, H, q) f32
    ddtpcol_ref = next(it)  # (1, q, H) f32
    ddtprow_ref = next(it)  # (1, H, q) f32
    dh0_ref = next(it)      # (1, DI, N) f32
    dcw_ref = next(it)      # (1, W, CD) f32 per-batch partial
    dcb_ref = next(it)      # (1, 1, CD) f32 per-batch partial
    ddsk_ref = next(it)     # (1, 1, DI) f32 per-batch partial (D grads)
    dcst_ref = next(it)     # (1, W, CD) f32 conv-state gradient
    dnw_ref = next(it) if has_norm else None  # (1, 1, DI) f32
    # scratch
    g_scr = next(it)        # (DI, N) f32 dL/d(state leaving current chunk)
    carry_scr = next(it)    # (8, CD) f32 next chunk's head rows of dcpre
    ddsk_scr = next(it)     # (1, DI) f32 running sum(dyd * x)
    dcb_scr = next(it)      # (1, CD) f32
    dcw_scr = next(it)      # (8, CD) f32 (W rows used)
    dnw_scr = next(it) if has_norm else None  # (1, DI) f32

    c_idx = pl.program_id(1)
    chunk = nc - 1 - c_idx  # absolute chunk index (reverse iteration)
    n = d_state
    heads_per_group = nheads // ngroups
    prec = lax.Precision.HIGHEST if highest else None
    width = conv_width

    @pl.when(c_idx == 0)
    def _():
        g_scr[:] = dhlast_ref[0]
        carry_scr[:] = jnp.zeros_like(carry_scr)
        ddsk_scr[:] = jnp.zeros_like(ddsk_scr)
        dcb_scr[:] = jnp.zeros_like(dcb_scr)
        dcw_scr[:] = jnp.zeros_like(dcw_scr)
        if has_norm:
            dnw_scr[:] = jnp.zeros_like(dnw_scr)

    zx = zx_ref[0]                          # (q, DPJ)
    q = zx.shape[0]
    cdt = zx.dtype

    # ---- 1. conv + SiLU recompute (identical math to the forward kernel;
    # left context from the PREVIOUS chunk's zx block, reverse-safe).
    raw = zx[:, d_inner:d_inner + conv_dim].astype(jnp.float32)
    prev_raw = zxprev_ref[0][
        q - (width - 1):, d_inner:d_inner + conv_dim
    ].astype(jnp.float32)                   # (W-1, CD)
    state_tail = cstate_ref[0][1:, :].astype(jnp.float32)
    left = jnp.where(chunk == 0, state_tail, prev_raw)
    ctx = jnp.concatenate([left, raw], axis=0)  # (q+W-1, CD)
    cw_taps = convw_ref[:].astype(jnp.float32)
    cy_pre = cw_taps[width - 1][None, :] * raw
    for k in range(width - 1):
        cy_pre = cy_pre + cw_taps[k][None, :] * ctx[k:k + q]
    cy_pre = cy_pre + convb_ref[:]
    sig_c = jax.nn.sigmoid(cy_pre)
    xbc = cy_pre * sig_c                    # (q, CD) f32
    gn = ngroups * n
    x = xbc[:, :d_inner].astype(cdt)        # (q, DI)
    bmat = xbc[:, d_inner:d_inner + gn].astype(cdt)
    cmat = xbc[:, d_inner + gn:].astype(cdt)

    # ---- 2. epilogue backward: silu(z) gate (+ gated RMSNorm) at the
    # stored pre-gate y.
    z_val = zx[:, :d_inner].astype(jnp.float32)
    yd = yd_ref[0].astype(jnp.float32)      # (q, DI)
    sig_z = jax.nn.sigmoid(z_val)
    silu_z = z_val * sig_z
    gate = yd * silu_z
    dout = dout_ref[0].astype(jnp.float32)
    if has_norm:
        var = jnp.mean(jnp.square(gate), axis=1, keepdims=True)
        r = lax.rsqrt(var + norm_eps)
        xn = gate * r                       # normalized pre-weight
        nw_row = nw_ref[:]                  # (1, DI) f32
        dnw_scr[:] += jnp.sum(dout * xn, axis=0, keepdims=True)
        dxn = dout * nw_row
        dot_row = jnp.sum(dxn * gate, axis=1, keepdims=True)
        dgate = dxn * r - gate * (r * r * r / d_inner) * dot_row
    else:
        dgate = dout
    dyd = dgate * silu_z                    # cotangent of pre-gate y (f32)
    dz = dgate * yd * (sig_z * (1.0 + z_val * (1.0 - sig_z)))

    # ---- 3. D-skip: yd = y_scan + D_h * x_h.
    ddsk_scr[:] += jnp.sum(dyd * xbc[:, :d_inner], axis=0, keepdims=True)

    scol = scol_ref[0]
    srow = srow_ref[0]
    dtcol = dtcol_ref[0]
    dtrow = dtrow_ref[0]
    hin = hins_ref[0, 0]                    # (DI, N) f32

    ids_r = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    ids_c = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    causal = ids_r >= ids_c

    dscol_ref[0] = jnp.zeros((q, nheads), jnp.float32)
    dsrow_ref[0] = jnp.zeros((nheads, q), jnp.float32)
    ddtpcol_ref[0] = jnp.zeros((q, nheads), jnp.float32)
    ddtprow_ref[0] = jnp.zeros((nheads, q), jnp.float32)

    cbs = []
    for g in range(ngroups):
        bg = bmat[:, g * n:(g + 1) * n]
        cg = cmat[:, g * n:(g + 1) * n]
        cbs.append(
            lax.dot_general(
                cg, bg, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
        )

    # ---- 4. reverse-chunk scan backward (math identical to
    # _ssd_bwd_kernel, dy := dyd, dx/db/dc kept in VMEM for the conv bwd).
    db_groups = [jnp.zeros((q, n), jnp.float32) for _ in range(ngroups)]
    dc_groups = [jnp.zeros((q, n), jnp.float32) for _ in range(ngroups)]
    dx_heads = []
    for h in range(nheads):
        g = h // heads_per_group
        gsl = slice(g * n, (g + 1) * n)
        hsl = slice(h * hdim, (h + 1) * hdim)
        sc = scol[:, h:h + 1]
        sr = srow[h:h + 1, :]
        slast = slast_ref[pl.program_id(0), chunk, h]
        dtr = dtrow[h:h + 1, :]

        e_seg = jnp.where(causal, sc - sr, -jnp.inf)
        E = jnp.exp(e_seg)
        dy_h = dyd[:, hsl]                  # (q, P) f32
        dy_c = dy_h.astype(cdt)
        xh = x[:, hsl]
        hin_h = hin[hsl, :]
        g_h = g_scr[hsl, :]

        M = (cbs[g] * E * dtr).astype(cdt)
        dx_h = lax.dot_general(
            M, dy_c, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dM = lax.dot_general(
            dy_c, xh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dDm = dM * cbs[g]
        T = dDm * E
        ddtprow_ref[0, h:h + 1, :] += jnp.sum(T, axis=0, keepdims=True)
        U = T * dtr
        dscol_ref[0, :, h:h + 1] += jnp.sum(U, axis=1, keepdims=True)
        dsrow_ref[0, h:h + 1, :] += -jnp.sum(U, axis=0, keepdims=True)
        dcb_m = (dM * E * dtr).astype(cdt)
        dc_groups[g] = dc_groups[g] + lax.dot_general(
            dcb_m, bmat[:, gsl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        db_groups[g] = db_groups[g] + lax.dot_general(
            dcb_m, cmat[:, gsl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        exp_sc = jnp.exp(sc)
        cw_f = cmat[:, gsl].astype(jnp.float32) * exp_sc
        dCw = lax.dot_general(
            dy_c, hin_h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dc_groups[g] = dc_groups[g] + dCw * exp_sc
        dscol_ref[0, :, h:h + 1] += jnp.sum(dCw * cw_f, axis=1,
                                            keepdims=True)
        dhin = lax.dot_general(
            dy_c, cw_f.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )

        w = dtcol[:, h:h + 1] * jnp.exp(slast - sc)
        R = lax.dot_general(
            bmat[:, gsl], g_h.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dx_h = dx_h + w * R
        dw = jnp.sum(xh.astype(jnp.float32) * R, axis=1, keepdims=True)
        ddtpcol_ref[0, :, h:h + 1] += dw * jnp.exp(slast - sc)
        dscol_ref[0, :, h:h + 1] += -(dw * w)
        xw = (xh.astype(jnp.float32) * w).astype(cdt)
        db_groups[g] = db_groups[g] + lax.dot_general(
            xw, g_h.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dslast = jnp.sum(dw * w) + jnp.exp(slast) * jnp.sum(g_h * hin_h)
        dsrow_ref[0, h:h + 1, q - 1:q] += dslast

        # D-skip x-grad folded here (scalar-per-head splat from SMEM).
        dx_heads.append(dx_h + d_ref[h] * dy_h)
        g_scr[hsl, :] = dhin + jnp.exp(slast) * g_h

    dh0_ref[0] = g_scr[:]

    # ---- 5. conv backward through SiLU to the raw [x B C] slab.
    dxbc = jnp.concatenate(
        dx_heads + db_groups + dc_groups, axis=1
    )                                       # (q, CD) f32
    dcpre = dxbc * (sig_c * (1.0 + cy_pre * (1.0 - sig_c)))
    dcb_scr[:] += jnp.sum(dcpre, axis=0, keepdims=True)
    for k in range(width):
        dcw_scr[k, :] += jnp.sum(dcpre * ctx[k:k + q], axis=0)

    # draw[t] = sum_m w[W-1-m] * dcpre_ext[t+m]; rows past the chunk come
    # from the NEXT chunk's head rows (processed last grid step — carried).
    dcpre_ext = jnp.concatenate([dcpre, carry_scr[:width - 1]], axis=0)
    draw = cw_taps[width - 1][None, :] * dcpre
    for m in range(1, width):
        draw = draw + cw_taps[width - 1 - m][None, :] * dcpre_ext[m:m + q]
    carry_scr[:width - 1] = dcpre[:width - 1]

    # Conv-state gradient: only chunk 0 reads the streaming window's tail.
    @pl.when(chunk == 0)
    def _():
        dcst_ref[0] = jnp.zeros_like(dcst_ref[0])
        for rr in range(width - 1):  # ctx rows 0..W-2 = cstate rows 1..W-1
            acc = jnp.zeros((conv_dim,), jnp.float32)
            for k in range(width):
                t = rr - k
                if 0 <= t < width - 1:  # only head rows can reach the tail
                    acc = acc + cw_taps[k] * dcpre[t]
            dcst_ref[0, rr + 1] = acc

    # ---- 6. assemble dzx = [dz | draw | 0 (dt lanes, grad via ddtp)].
    dzx_ref[0] = jnp.concatenate(
        [dz.astype(cdt), draw.astype(cdt),
         jnp.zeros((q, zx.shape[1] - d_inner - conv_dim), cdt)], axis=1,
    )

    dcw_ref[0] = dcw_scr[:width]
    dcb_ref[0, 0] = dcb_scr[0]
    ddsk_ref[0, 0] = ddsk_scr[0]
    if has_norm:
        dnw_ref[0, 0] = dnw_scr[0]


def _merged_scan_fwd_core(
    *, x, x_f, bmat, cmat, scol, srow, dtcol, dtrow, slast_row,
    hT_scr, onehot, dhp, nheads, hdim, prec, cdt,
):
    """MXU-merged chunk forward (ngroups == 1), shared by the mixer-level
    and projected-mixer forward kernels.

    Per head the original walk runs three dots: the intra-chunk
    ``(cb*E*dt) @ x_h``, the inter-chunk ``(C*exp(s)) @ h_prev^T``, and the
    state update ``(x*w)^T @ B``. With one shared B/C group the latter two
    are linear in the per-head decay scalars, so they merge into single big
    dots over ALL heads: ``(cmat @ hT) * exp(s)_splat`` and
    ``bmat^T @ (x * w_splat)`` against the TRANSPOSED (N, DI) state, with
    the (q, H) -> (q, DI) scale splats done by a one-hot matmul. Only the
    head-diagonal intra-chunk dot stays per-head.

    Updates ``hT_scr`` in place and returns the (q, DI) f32 pre-gate y
    (scan + D-skip).
    """
    f32 = jnp.float32
    q = x.shape[0]

    ids_r = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    ids_c = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    causal = ids_r >= ids_c

    # Batched decay scalars, splatted to head lanes via the MXU.
    esc_dim = lax.dot_general(jnp.exp(scol), onehot,
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    W_all = dtcol * jnp.exp(slast_row - scol)               # (q, H)
    w_dim = lax.dot_general(W_all, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    eslast_dim = lax.dot_general(jnp.exp(slast_row), onehot,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)

    hT = hT_scr[:]                                          # (N, DI) f32
    # Inter-chunk y: per-head (C*exp(s)) @ h_prev^T == (cmat @ hT) * splat.
    y_state = lax.dot_general(cmat, hT.astype(cdt), (((1,), (0,)), ((), ())),
                              preferred_element_type=f32,
                              precision=prec) * esc_dim
    # State update: per-head (x*w)^T @ B == bmat^T @ (x * w_splat).
    xw_all = (x_f * w_dim).astype(cdt)
    s_T = lax.dot_general(bmat, xw_all, (((0,), (0,)), ((), ())),
                          preferred_element_type=f32, precision=prec)
    hT_scr[:] = eslast_dim * hT + s_T

    # Intra-chunk y (genuinely head-diagonal).
    cb = lax.dot_general(cmat, bmat, (((1,), (1,)), ((), ())),
                         preferred_element_type=f32, precision=prec)
    y_cols = []
    for h in range(nheads):
        sc = scol[:, h:h + 1]
        sr = srow[h:h + 1, :]
        seg = jnp.where(causal, sc - sr, -jnp.inf)
        m = (cb * jnp.exp(seg) * dtrow[h:h + 1, :]).astype(cdt)
        xh = x[:, h * hdim:(h + 1) * hdim]
        y_cols.append(
            lax.dot_general(m, xh, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
        )

    return jnp.concatenate(y_cols, axis=1) + y_state + dhp * x_f


def _merged_scan_bwd_core(
    *, x, x_f, bmat, cmat, dyd, scol, srow, dtcol, dtrow, slast_row,
    hinT, onehot, dhp, g_scr,
    dscol_ref, dsrow_ref, ddtpcol_ref, ddtprow_ref, dh0_ref,
    nheads, hdim, prec, cdt,
):
    """MXU-merged reverse-chunk scan backward (ngroups == 1), shared by the
    mixer-level and projected-mixer mega-backward kernels.

    Hoists the per-head (q, 1)/(1, 1) decay scales onto shared operands so
    every state-coupled gradient is one big MXU dot over ALL heads; the
    (q, H) -> (q, DI) head splat/reduce runs as a matmul against a one-hot
    (H, DI) matrix (an in-kernel reshape would force a Mosaic relayout).
    Only the intra-chunk (q, q) attention algebra stays per-head (it is
    genuinely head-diagonal).

    Updates ``g_scr`` (the TRANSPOSED (N, DI) state cotangent), writes the
    decay-gradient refs and ``dh0_ref``, and returns the (q, CD) cotangent
    of the post-SiLU [x B C] slab.
    """
    f32 = jnp.float32
    q = x.shape[0]
    dy_c16 = dyd.astype(cdt)                # (q, DI)

    ids_r = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    ids_c = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    causal = ids_r >= ids_c

    # ---- batched decay scalars, splatted to head lanes via the MXU.
    esc = jnp.exp(scol)                                     # (q, H)
    esc_dim = lax.dot_general(esc, onehot, (((1,), (0,)), ((), ())),
                              preferred_element_type=f32, precision=prec)
    dyscaled = (dyd * esc_dim).astype(cdt)                  # (q, DI)
    eW = jnp.exp(slast_row - scol)                          # (q, H)
    W_all = dtcol * eW                                      # (q, H)
    w_dim = lax.dot_general(W_all, onehot, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    eslast = jnp.exp(slast_row)                             # (1, H)
    eslast_dim = lax.dot_general(eslast, onehot, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)

    gT = g_scr[:]                                           # (N, DI) f32
    g16 = gT.astype(cdt)
    hin16 = hinT.astype(cdt)

    # ---- merged big dots (state-coupled terms, all heads at once).
    # R_all[q, DI] = per-head bmat @ g_h^T == bmat (q,N) @ gT (N,DI).
    R_all = lax.dot_general(bmat, g16, (((1,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    # dc state part: (dyd * exp(s)) @ hin -> (q, N).
    dc_state = lax.dot_general(dyscaled, hin16, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32, precision=prec)
    # dhinT = cmat^T @ (dyd * exp(s)) -> (N, DI).
    dhinT = lax.dot_general(cmat, dyscaled, (((0,), (0,)), ((), ())),
                            preferred_element_type=f32, precision=prec)
    # Zb[q, DI] = per-head cmat @ hin_h^T == cmat (q,N) @ hinT (N,DI).
    Zb = lax.dot_general(cmat, hin16, (((1,), (0,)), ((), ())),
                         preferred_element_type=f32, precision=prec)
    # db state part: (x * w) @ g^T with w = dt*exp(s_last - s) splatted.
    xw_all = (x_f * w_dim).astype(cdt)
    db_state = lax.dot_general(xw_all, g16, (((1,), (1,)), ((), ())),
                               preferred_element_type=f32, precision=prec)
    # dw_all[q, H]: per-head sum(x_h * R_h) as a head-reduce matmul.
    xR = x_f * R_all
    dw_all = lax.dot_general(xR, onehot, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32, precision=prec)
    # dscol contribution from the dCw term: exp(s) * head-reduce(dyd * Zb).
    dZ = dyd * Zb
    dscol_b = esc * lax.dot_general(dZ, onehot, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32,
                                    precision=prec)
    # dslast terms (1, H).
    t1 = jnp.sum(dw_all * W_all, axis=0, keepdims=True)
    gh_prod = jnp.sum(gT * hinT, axis=0, keepdims=True)     # (1, DI)
    t2 = eslast * lax.dot_general(gh_prod, onehot, (((1,), (1,)), ((), ())),
                                  preferred_element_type=f32,
                                  precision=prec)
    dslast_row = t1 + t2                                    # (1, H)

    # dx state part + D skip, batched.
    dx_state = w_dim * R_all + dhp * dyd                    # (q, DI) f32

    # g update (batched): g' = dhinT + exp(s_last) * g.
    g_scr[:] = dhinT + eslast_dim * gT

    # ---- per-head (q, q) intra-chunk algebra (genuinely head-diagonal).
    sum_dcb = jnp.zeros((q, q), f32)
    dx_cols = []
    dsc_cols = []
    ddtpr_rows = []
    dsr_rows = []
    cb = lax.dot_general(cmat, bmat, (((1,), (1,)), ((), ())),
                         preferred_element_type=f32, precision=prec)
    for h in range(nheads):
        hsl = slice(h * hdim, (h + 1) * hdim)
        sc = scol[:, h:h + 1]
        sr = srow[h:h + 1, :]
        dtr = dtrow[h:h + 1, :]
        E = jnp.exp(jnp.where(causal, sc - sr, -jnp.inf))
        dy_h = dy_c16[:, hsl]
        xh = x[:, hsl]
        M = (cb * E * dtr).astype(cdt)
        dx_h = lax.dot_general(M, dy_h, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32, precision=prec)
        dM = lax.dot_general(dy_h, xh, (((1,), (1,)), ((), ())),
                             preferred_element_type=f32, precision=prec)
        EM = dM * E
        dcb_m = EM * dtr
        sum_dcb = sum_dcb + dcb_m
        T = dM * (cb * E)
        ddtpr_rows.append(jnp.sum(T, axis=0, keepdims=True))
        U = T * dtr
        dsc_cols.append(jnp.sum(U, axis=1, keepdims=True))
        dsr_rows.append(-jnp.sum(U, axis=0, keepdims=True))
        dx_cols.append(dx_h)

    # Intra-chunk db/dc: the per-head dcb_m matrices SUM before hitting the
    # shared B/C (ngroups == 1) — 2 (q,q)x(q,N) dots instead of 2*H.
    dcb16 = sum_dcb.astype(cdt)
    dc_intra = lax.dot_general(dcb16, bmat, (((1,), (0,)), ((), ())),
                               preferred_element_type=f32, precision=prec)
    db_intra = lax.dot_general(dcb16, cmat, (((0,), (0,)), ((), ())),
                               preferred_element_type=f32, precision=prec)

    dc_all = dc_intra + dc_state
    db_all = db_intra + db_state

    # ---- batched decay-grad stores (one store per output, no RMW).
    dsc_intra = jnp.concatenate(dsc_cols, axis=1)           # (q, H)
    dscol_ref[0] = dsc_intra + dscol_b - dw_all * W_all
    ddtpcol_ref[0] = dw_all * eW
    ddtprow_ref[0] = jnp.concatenate(ddtpr_rows, axis=0)    # (H, q)
    lastmask = (lax.broadcasted_iota(jnp.int32, (1, q), 1)
                == q - 1).astype(f32)
    eyeh = (lax.broadcasted_iota(jnp.int32, (nheads, nheads), 0)
            == lax.broadcasted_iota(jnp.int32, (nheads, nheads), 1)
            ).astype(f32)
    dslast_col = lax.dot_general(eyeh, dslast_row, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32, precision=prec)
    dsrow_ref[0] = (jnp.concatenate(dsr_rows, axis=0)
                    + dslast_col * lastmask)

    dh0_ref[0] = g_scr[:]

    dx_all = jnp.concatenate(dx_cols, axis=1) + dx_state    # (q, DI) f32
    return jnp.concatenate([dx_all, db_all, dc_all], axis=1)


def _ssd_mixer_bwd_merged_kernel(
    zx_ref,       # (1, q, DPJ) in_proj output (current chunk)
    zxprev_ref,   # (1, q, DPJ) previous chunk (conv left context)
    cstate_ref,   # (1, W, CD) streaming conv window
    convw_ref,    # (W, CD)
    convb_ref,    # (1, CD) f32
    yd_ref,       # (1, q, DI) f32 pre-gate y checkpoint
    dout_ref,     # (1, q, DI) cotangent of the gated/normed output
    scol_ref,     # (1, q, H) f32
    srow_ref,     # (1, H, q) f32
    dtcol_ref,    # (1, q, H) f32
    dtrow_ref,    # (1, H, q) f32
    slastrow_ref,  # (1, 1, 1, H) f32 last decay logit of this chunk
    hins_ref,     # (1, 1, N, DI) f32 state ENTERING this chunk, TRANSPOSED
    dhlast_ref,   # (1, N, DI) f32 (transposed state cotangent)
    dhp_ref,      # (1, DI) f32: D splat to head lanes (repeat(D, P))
    onehot_ref,   # (H, DI) f32: repeat(eye(H), P, axis=1) head-expansion
    *maybe_nw_and_outs,
    nheads: int,
    hdim: int,
    d_state: int,
    nc: int,
    highest: bool,
    has_norm: bool,
    norm_eps: float,
    conv_width: int,
    d_inner: int,
    conv_dim: int,
):
    """MXU-merged whole-mixer backward (the ngroups == 1 fast path).

    Same math and output contract as :func:`_ssd_mixer_bwd_kernel`, but the
    per-head small dots are merged into a few big MXU dots by hoisting the
    per-head (q, 1)/(1, 1) decay scales onto shared operands (all terms are
    linear in them when every head shares one B/C group):

    * state-coupled dx/db/dc/dhin: two (q, DI)x(DI, N) and two (q, N)x(N, DI)
      dots over ALL heads at once, with ``exp(s)``/``dt*exp(s_last - s)``
      folded into ``dy``/``x`` via a one-hot (H, DI) head-expansion matmul
      (an in-kernel (q,H)->(q,DI) "repeat" would force a Mosaic relayout;
      the MXU does it for free);
    * the per-head (q, 1) scalar chains (dw, dslast, the exp() decay grads)
      become batched (q, H)/(1, H) VPU ops plus (q, DI)x(DI, H) head-reduce
      matmuls against the same one-hot;
    * state scratch is kept TRANSPOSED as (N, DI) so both its read (R = B @
      g^T) and its update (g' = C^T @ dy_scaled + e*g) are single big dots.

    Only the intra-chunk (q, q) attention algebra stays per-head (it is
    genuinely head-diagonal). Measured at Base train shapes: 0.523 ms/layer
    vs 1.485 for the per-head kernel (2.84x).
    """
    it = iter(maybe_nw_and_outs)
    nw_ref = next(it) if has_norm else None
    dzx_ref = next(it)      # (1, q, DPJ)
    dscol_ref = next(it)    # (1, q, H) f32
    dsrow_ref = next(it)    # (1, H, q) f32
    ddtpcol_ref = next(it)  # (1, q, H) f32
    ddtprow_ref = next(it)  # (1, H, q) f32
    dh0_ref = next(it)      # (1, N, DI) f32 (transposed)
    dcw_ref = next(it)      # (1, W, CD) f32 per-batch partial
    dcb_ref = next(it)      # (1, 1, CD) f32 per-batch partial
    ddsk_ref = next(it)     # (1, 1, DI) f32 per-batch partial (D grads)
    dcst_ref = next(it)     # (1, W, CD) f32 conv-state gradient
    dnw_ref = next(it) if has_norm else None  # (1, 1, DI) f32
    g_scr = next(it)        # (N, DI) f32 dL/d(state leaving current chunk)
    carry_scr = next(it)    # (8, CD) f32 next chunk's head rows of dcpre
    ddsk_scr = next(it)     # (1, DI) f32 running sum(dyd * x)
    dcb_scr = next(it)      # (1, CD) f32
    dcw_scr = next(it)      # (8, CD) f32 (W rows used)
    dnw_scr = next(it) if has_norm else None  # (1, DI) f32

    c_idx = pl.program_id(1)
    chunk = nc - 1 - c_idx  # absolute chunk index (reverse iteration)
    n = d_state
    prec = lax.Precision.HIGHEST if highest else None
    width = conv_width
    f32 = jnp.float32

    @pl.when(c_idx == 0)
    def _():
        g_scr[:] = dhlast_ref[0]
        carry_scr[:] = jnp.zeros_like(carry_scr)
        ddsk_scr[:] = jnp.zeros_like(ddsk_scr)
        dcb_scr[:] = jnp.zeros_like(dcb_scr)
        dcw_scr[:] = jnp.zeros_like(dcw_scr)
        if has_norm:
            dnw_scr[:] = jnp.zeros_like(dnw_scr)

    zx = zx_ref[0]
    q = zx.shape[0]
    cdt = zx.dtype

    # ---- 1. conv + SiLU recompute (identical to _ssd_mixer_bwd_kernel).
    raw = zx[:, d_inner:d_inner + conv_dim].astype(f32)
    prev_raw = zxprev_ref[0][q - (width - 1):,
                             d_inner:d_inner + conv_dim].astype(f32)
    state_tail = cstate_ref[0][1:, :].astype(f32)
    left = jnp.where(chunk == 0, state_tail, prev_raw)
    ctx = jnp.concatenate([left, raw], axis=0)
    cw_taps = convw_ref[:].astype(f32)
    cy_pre = cw_taps[width - 1][None, :] * raw
    for k in range(width - 1):
        cy_pre = cy_pre + cw_taps[k][None, :] * ctx[k:k + q]
    cy_pre = cy_pre + convb_ref[:]
    sig_c = jax.nn.sigmoid(cy_pre)
    xbc = cy_pre * sig_c
    x = xbc[:, :d_inner].astype(cdt)
    x_f = xbc[:, :d_inner]
    bmat = xbc[:, d_inner:d_inner + n].astype(cdt)
    cmat = xbc[:, d_inner + n:].astype(cdt)

    # ---- 2. epilogue backward (batched, identical).
    z_val = zx[:, :d_inner].astype(f32)
    yd = yd_ref[0].astype(f32)
    sig_z = jax.nn.sigmoid(z_val)
    silu_z = z_val * sig_z
    gate = yd * silu_z
    dout = dout_ref[0].astype(f32)
    if has_norm:
        var = jnp.mean(jnp.square(gate), axis=1, keepdims=True)
        r = lax.rsqrt(var + norm_eps)
        xn = gate * r
        nw_row = nw_ref[:]
        dnw_scr[:] += jnp.sum(dout * xn, axis=0, keepdims=True)
        dxn = dout * nw_row
        dot_row = jnp.sum(dxn * gate, axis=1, keepdims=True)
        dgate = dxn * r - gate * (r * r * r / d_inner) * dot_row
    else:
        dgate = dout
    dyd = dgate * silu_z
    dz = dgate * yd * (sig_z * (1.0 + z_val * (1.0 - sig_z)))

    # ---- 3. D-skip.
    ddsk_scr[:] += jnp.sum(dyd * x_f, axis=0, keepdims=True)

    # ---- 4-6. MXU-merged reverse-chunk scan backward (shared core).
    dxbc = _merged_scan_bwd_core(
        x=x, x_f=x_f, bmat=bmat, cmat=cmat, dyd=dyd,
        scol=scol_ref[0], srow=srow_ref[0], dtcol=dtcol_ref[0],
        dtrow=dtrow_ref[0], slast_row=slastrow_ref[0, 0],
        hinT=hins_ref[0, 0], onehot=onehot_ref[:], dhp=dhp_ref[:],
        g_scr=g_scr, dscol_ref=dscol_ref, dsrow_ref=dsrow_ref,
        ddtpcol_ref=ddtpcol_ref, ddtprow_ref=ddtprow_ref, dh0_ref=dh0_ref,
        nheads=nheads, hdim=hdim, prec=prec, cdt=cdt,
    )

    # ---- 7. conv backward through SiLU (identical to the per-head kernel).
    dcpre = dxbc * (sig_c * (1.0 + cy_pre * (1.0 - sig_c)))
    dcb_scr[:] += jnp.sum(dcpre, axis=0, keepdims=True)
    for k in range(width):
        dcw_scr[k, :] += jnp.sum(dcpre * ctx[k:k + q], axis=0)

    dcpre_ext = jnp.concatenate([dcpre, carry_scr[:width - 1]], axis=0)
    draw = cw_taps[width - 1][None, :] * dcpre
    for m in range(1, width):
        draw = draw + cw_taps[width - 1 - m][None, :] * dcpre_ext[m:m + q]
    carry_scr[:width - 1] = dcpre[:width - 1]

    @pl.when(chunk == 0)
    def _():
        dcst_ref[0] = jnp.zeros_like(dcst_ref[0])
        for rr in range(width - 1):
            acc = jnp.zeros((conv_dim,), f32)
            for k in range(width):
                t = rr - k
                if 0 <= t < width - 1:
                    acc = acc + cw_taps[k] * dcpre[t]
            dcst_ref[0, rr + 1] = acc

    dzx_ref[0] = jnp.concatenate(
        [dz.astype(cdt), draw.astype(cdt),
         jnp.zeros((q, zx.shape[1] - d_inner - conv_dim), cdt)], axis=1)

    dcw_ref[0] = dcw_scr[:width]
    dcb_ref[0, 0] = dcb_scr[0]
    ddsk_ref[0, 0] = ddsk_scr[0]
    if has_norm:
        dnw_ref[0, 0] = dnw_scr[0]


def _ssd_mixer_bwd_merged(
    zx, dt_p, A, cstate, convw, convb, yd, hins, dout, dhlast, D,
    norm_weight, *, nheads, hdim, d_state, d_inner, conv_dim, chunk_size,
    norm_eps, interpret, hins_transposed=False,
):
    """pallas_call wrapper for the merged kernel (ngroups == 1).

    Same operand/output contract as the per-head path inside
    :func:`_ssd_mixer_bwd_padded`; the state tensors are transposed to the
    (N, DI) layout at the XLA level (cheap relayouts of small tensors) so
    every in-kernel state access is a single big MXU dot.
    """
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
    s_last = s.reshape(bsz, nc, q, nheads)[:, :, -1:, :]  # (B, nc, 1, H)
    hinsT = hins if hins_transposed else hins.swapaxes(2, 3)  # (B,nc,N,DI)
    dhlT = dhlast.swapaxes(1, 2)                          # (B, N, DI)
    d_hp = jnp.repeat(D.astype(jnp.float32), hdim)[None, :]   # (1, DI)
    onehot = jnp.repeat(jnp.eye(nheads, dtype=jnp.float32), hdim, axis=1)

    rblk = lambda b, c: (b, nc - 1 - c, 0)
    rprev = lambda b, c: (b, jnp.maximum(nc - 1 - c - 1, 0), 0)
    rrow = lambda b, c: (b, 0, nc - 1 - c)
    rchunk = lambda b, c: (b, nc - 1 - c, 0, 0)
    fixed = lambda b, c: (b, 0, 0)
    fixed2 = lambda b, c: (0, 0)

    in_specs = [
        pl.BlockSpec((1, q, dpj), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, dpj), rprev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((width, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_inner), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_inner), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, 1, nheads), rchunk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d_state, d_inner), rchunk,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_state, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((nheads, d_inner), fixed2, memory_space=pltpu.VMEM),
    ]
    operands = [zx, zx, cstate, convw, convb, yd, dout, s, srow, dt_p,
                dtrow, s_last, hinsT, dhlT, d_hp, onehot]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, dpj), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_state, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, dpj), zx.dtype),            # dzx
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # dscol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # dsrow
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # ddtpcol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # ddtprow
        jax.ShapeDtypeStruct((bsz, d_state, d_inner), jnp.float32),  # dh0T
        jax.ShapeDtypeStruct((bsz, width, conv_dim), jnp.float32),  # dcw
        jax.ShapeDtypeStruct((bsz, 1, conv_dim), jnp.float32),     # dcb
        jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),      # dD cols
        jax.ShapeDtypeStruct((bsz, width, conv_dim), jnp.float32),  # dcst
    ]
    if has_norm:
        out_specs.append(
            pl.BlockSpec((1, 1, d_inner), fixed, memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32)   # dnw
        )

    scratch = [
        pltpu.VMEM((d_state, d_inner), jnp.float32),   # g (TRANSPOSED)
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcpre head carry
        pltpu.VMEM((1, d_inner), jnp.float32),         # dD accumulator
        pltpu.VMEM((1, conv_dim), jnp.float32),        # dcb accumulator
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcw accumulator
    ]
    if has_norm:
        scratch.append(pltpu.VMEM((1, d_inner), jnp.float32))  # dnw acc

    outs = pl.pallas_call(
        functools.partial(
            _ssd_mixer_bwd_merged_kernel, nheads=nheads, hdim=hdim,
            d_state=d_state, nc=nc, highest=(zx.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps, conv_width=width,
            d_inner=d_inner, conv_dim=conv_dim,
        ),
        grid=(bsz, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    outs = list(outs)
    outs[5] = outs[5].swapaxes(1, 2)  # dh0: (B, N, DI) -> (B, DI, N)
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret", "norm_eps", "d_inner", "conv_dim",
                     "merged", "hins_transposed"),
)
def _ssd_mixer_bwd_padded(
    zx: Array,       # (B, Lp, DPJ), Lp % q == 0
    dt_p: Array,     # (B, Lp, H) f32 post-softplus (0 on padded rows)
    A: Array,        # (H,) f32 negative
    cstate: Array,   # (B, W, CD) raw-input window (time-major)
    convw: Array,    # (W, CD)
    convb: Array,    # (1, CD) f32
    yd: Array,       # (B, Lp, DI) f32 pre-gate y checkpoint
    hins: Array,     # (B, nc, DI, N) f32
    dout: Array,     # (B, Lp, DI) cotangent of the gated output
    dhlast: Array,   # (B, DI, N) f32
    D: Array,        # (H,) f32
    norm_weight,     # (1, DI) f32 or None
    *,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    d_inner: int,
    conv_dim: int,
    chunk_size: int,
    norm_eps: float = 1e-5,
    interpret: bool = False,
    merged: Optional[bool] = None,
    hins_transposed: bool = False,
):
    # ``merged`` is static (part of the jit key): callers inside traced
    # code resolve the env knob OUTSIDE this function so a knob flip can
    # never reuse a stale trace. None = resolve here (direct/test callers).
    # ``hins_transposed``: the merged FORWARD emits hins as (B, nc, N, DI).
    if merged is None:
        from videomamba_tpu.ops.dispatch import ssd_bwd_merged_enabled

        merged = ssd_bwd_merged_enabled()
    if ngroups == 1 and merged:
        return _ssd_mixer_bwd_merged(
            zx, dt_p, A, cstate, convw, convb, yd, hins, dout, dhlast, D,
            norm_weight, nheads=nheads, hdim=hdim, d_state=d_state,
            d_inner=d_inner, conv_dim=conv_dim, chunk_size=chunk_size,
            norm_eps=norm_eps, interpret=interpret,
            hins_transposed=hins_transposed,
        )
    if hins_transposed:
        hins = hins.swapaxes(2, 3)  # back to the per-head (B, nc, DI, N)

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

    rblk = lambda b, c: (b, nc - 1 - c, 0)
    rprev = lambda b, c: (b, jnp.maximum(nc - 1 - c - 1, 0), 0)
    rrow = lambda b, c: (b, 0, nc - 1 - c)
    rchunk = lambda b, c: (b, nc - 1 - c, 0, 0)
    fixed = lambda b, c: (b, 0, 0)
    fixed2 = lambda b, c: (0, 0)

    in_specs = [
        pl.BlockSpec((1, q, dpj), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, dpj), rprev, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((width, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_inner), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_inner), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # s_last
        pl.BlockSpec((1, 1, d_inner, d_state), rchunk,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # D (H,)
    ]
    operands = [zx, zx, cstate, convw, convb, yd, dout, s, srow, dt_p,
                dtrow, s_last, hins, dhlast, D.astype(jnp.float32)]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, dpj), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, dpj), zx.dtype),            # dzx
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # dscol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # dsrow
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # ddtpcol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # ddtprow
        jax.ShapeDtypeStruct((bsz, d_inner, d_state), jnp.float32),  # dh0
        jax.ShapeDtypeStruct((bsz, width, conv_dim), jnp.float32),  # dcw
        jax.ShapeDtypeStruct((bsz, 1, conv_dim), jnp.float32),     # dcb
        jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),      # dD cols
        jax.ShapeDtypeStruct((bsz, width, conv_dim), jnp.float32),  # dcst
    ]
    if has_norm:
        out_specs.append(
            pl.BlockSpec((1, 1, d_inner), fixed, memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32)   # dnw
        )

    scratch = [
        pltpu.VMEM((d_inner, d_state), jnp.float32),   # g (state cotangent)
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcpre head carry
        pltpu.VMEM((1, d_inner), jnp.float32),         # dD accumulator
        pltpu.VMEM((1, conv_dim), jnp.float32),        # dcb accumulator
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcw accumulator
    ]
    if has_norm:
        scratch.append(pltpu.VMEM((1, d_inner), jnp.float32))  # dnw acc

    outs = pl.pallas_call(
        functools.partial(
            _ssd_mixer_bwd_kernel, nheads=nheads, hdim=hdim,
            ngroups=ngroups, d_state=d_state, nc=nc,
            highest=(zx.dtype == jnp.float32), has_norm=has_norm,
            norm_eps=norm_eps, conv_width=width, d_inner=d_inner,
            conv_dim=conv_dim,
        ),
        grid=(bsz, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Double-buffered (q, DPJ) blocks x3 + checkpoints exceed the
            # 16MB scoped-VMEM default at Base shapes; v5e has more.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return outs


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


def _ssd_mixer_fwd_merged_kernel(
    zx_ref,       # (1, q, DPJ)
    cstate_ref,   # (1, W, CD)
    convw_ref,    # (W, CD)
    convb_ref,    # (1, CD) f32
    scol_ref,     # (1, q, H) f32
    srow_ref,     # (1, H, q) f32
    dtcol_ref,    # (1, q, H) f32
    dtrow_ref,    # (1, H, q) f32
    slastrow_ref,  # (1, 1, 1, H) f32
    h0_ref,       # (1, N, DI) f32 TRANSPOSED initial state
    dhp_ref,      # (1, DI) f32: D splat to head lanes
    onehot_ref,   # (H, DI) f32 head-expansion
    *maybe_nw_and_outs,
    nheads: int,
    hdim: int,
    d_state: int,
    highest: bool,
    has_norm: bool,
    norm_eps: float,
    conv_width: int,
    d_inner: int,
    conv_dim: int,
    checkpoints: bool,
):
    """MXU-merged whole-mixer forward (ngroups == 1): conv+SiLU, the merged
    chunk walk (:func:`_merged_scan_fwd_core`), D-skip, gate (+RMSNorm) —
    same contract as the ``fuse_conv`` :func:`_ssd_kernel` variant except
    the state (h0/hlast, and the hins checkpoints) is TRANSPOSED (N, DI).
    """
    it = iter(maybe_nw_and_outs)
    nw_ref = next(it) if has_norm else None
    y_ref = next(it)        # (1, q, DI)
    hlast_ref = next(it)    # (1, N, DI) f32 (transposed)
    hins_ref = next(it) if checkpoints else None  # (1, 1, N, DI)
    yd_ref = next(it) if checkpoints else None    # (1, q, DI)
    hT_scr = next(it)       # (N, DI) f32
    xtail_scr = next(it)    # (W-1, CD) f32 raw conv tail

    c_idx = pl.program_id(1)
    prec = lax.Precision.HIGHEST if highest else None
    width = conv_width
    f32 = jnp.float32

    @pl.when(c_idx == 0)
    def _():
        hT_scr[:] = h0_ref[0]

    if checkpoints:
        # Residual for the backward kernel: the state ENTERING this chunk.
        hins_ref[0, 0] = hT_scr[:]

    zx = zx_ref[0]                          # (q, DPJ)
    q = zx.shape[0]
    cdt = zx.dtype

    # ---- causal conv + SiLU (identical to the per-head fuse_conv path).
    z_val = zx[:, :d_inner]
    raw = zx[:, d_inner:d_inner + conv_dim].astype(f32)
    state_tail = cstate_ref[0][1:, :].astype(f32)
    left = jnp.where(c_idx == 0, state_tail, xtail_scr[:])
    ctx = jnp.concatenate([left, raw], axis=0)
    xtail_scr[:] = raw[q - (width - 1):]
    cw_taps = convw_ref[:].astype(f32)
    cy = cw_taps[width - 1][None, :] * raw
    for k in range(width - 1):
        cy = cy + cw_taps[k][None, :] * ctx[k:k + q]
    cy = cy + convb_ref[:].astype(f32)
    cy = cy * jax.nn.sigmoid(cy)
    n = d_state
    x_f = cy[:, :d_inner]
    x = x_f.astype(cdt)
    bmat = cy[:, d_inner:d_inner + n].astype(cdt)
    cmat = cy[:, d_inner + n:].astype(cdt)

    # ---- MXU-merged chunk walk (shared core) + D-skip.
    yd = _merged_scan_fwd_core(
        x=x, x_f=x_f, bmat=bmat, cmat=cmat, scol=scol_ref[0],
        srow=srow_ref[0], dtcol=dtcol_ref[0], dtrow=dtrow_ref[0],
        slast_row=slastrow_ref[0, 0], hT_scr=hT_scr, onehot=onehot_ref[:],
        dhp=dhp_ref[:], nheads=nheads, hdim=hdim, prec=prec, cdt=cdt,
    )

    # ---- epilogue: silu(z) gate (+ RMSNorm).
    if checkpoints:
        yd_ref[0] = yd.astype(yd_ref.dtype)
    gated = yd * jax.nn.silu(z_val.astype(f32))
    if has_norm:
        var = jnp.mean(jnp.square(gated), axis=1, keepdims=True)
        gated = gated * lax.rsqrt(var + norm_eps) * nw_ref[:].astype(f32)
    y_ref[0] = gated.astype(y_ref.dtype)

    hlast_ref[0] = hT_scr[:]


def _ssd_mixer_fwd_merged(
    zx, dt_p, A, cstate, convw, convb, h0, D, norm_weight, *, nheads, hdim,
    d_state, d_inner, conv_dim, chunk_size, interpret, norm_eps,
    checkpoints,
):
    """pallas_call wrapper for the merged mixer forward (ngroups == 1).

    Same external contract as the per-head path inside
    :func:`_ssd_mixer_padded` EXCEPT the hins checkpoint comes out
    TRANSPOSED as (B, nc, N, DI) — exactly the layout the merged backward
    consumes, so the training round trip does zero hins relayouts. hlast
    is transposed back to (B, DI, N) in XLA (a small tensor, once per
    call).
    """
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
    s_last = s.reshape(bsz, nc, q, nheads)[:, :, -1:, :]  # (B, nc, 1, H)
    h0T = h0.swapaxes(1, 2)                               # (B, N, DI)
    d_hp = jnp.repeat(D.astype(jnp.float32), hdim)[None, :]
    onehot = jnp.repeat(jnp.eye(nheads, dtype=jnp.float32), hdim, axis=1)

    blk = lambda b, c: (b, c, 0)
    fixed = lambda b, c: (b, 0, 0)
    row = lambda b, c: (b, 0, c)
    chunk4 = lambda b, c: (b, c, 0, 0)
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
        pl.BlockSpec((1, 1, 1, nheads), chunk4, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_state, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((nheads, d_inner), fixed2, memory_space=pltpu.VMEM),
    ]
    operands = [zx, cstate, convw, convb, s, srow, dt_p, dtrow, s_last,
                h0T, d_hp, onehot]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, d_inner), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_state, d_inner), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, d_inner), zx.dtype),
        jax.ShapeDtypeStruct((bsz, d_state, d_inner), jnp.float32),
    ]
    if checkpoints:
        out_specs.append(
            pl.BlockSpec((1, 1, d_state, d_inner), chunk4,
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, nc, d_state, d_inner), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, q, d_inner), blk, memory_space=pltpu.VMEM)
        )
        # Pre-gate y checkpoint in the COMPUTE dtype (see the per-head
        # wrapper's note).
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, lp, d_inner), zx.dtype)
        )

    outs = pl.pallas_call(
        functools.partial(
            _ssd_mixer_fwd_merged_kernel, nheads=nheads, hdim=hdim,
            d_state=d_state, highest=(zx.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps, conv_width=width,
            d_inner=d_inner, conv_dim=conv_dim, checkpoints=checkpoints,
        ),
        grid=(bsz, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((d_state, d_inner), jnp.float32),   # hT (TRANSPOSED)
            pltpu.VMEM((width - 1, conv_dim), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*operands)
    outs = list(outs)
    outs[1] = outs[1].swapaxes(1, 2)  # hlast: (B, N, DI) -> (B, DI, N)
    return tuple(outs) if checkpoints else (outs[0], outs[1])


@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret", "norm_eps", "d_inner", "conv_dim",
                     "checkpoints", "merged"),
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
    checkpoints: bool = False,
    merged: Optional[bool] = None,
):
    # ``merged`` is static (part of the jit key); see _ssd_mixer_bwd_padded.
    # NOTE: the merged path's hins checkpoint output is TRANSPOSED
    # (B, nc, N, DI) — the layout the merged backward consumes directly.
    if merged is None:
        from videomamba_tpu.ops.dispatch import ssd_fwd_merged_enabled

        merged = ssd_fwd_merged_enabled()
    if ngroups == 1 and merged:
        return _ssd_mixer_fwd_merged(
            zx, dt_p, A, cstate, convw, convb, h0, D, norm_weight,
            nheads=nheads, hdim=hdim, d_state=d_state, d_inner=d_inner,
            conv_dim=conv_dim, chunk_size=chunk_size, interpret=interpret,
            norm_eps=norm_eps, checkpoints=checkpoints,
        )

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

    out_specs = [
        pl.BlockSpec((1, q, d_inner), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, d_inner), zx.dtype),
        jax.ShapeDtypeStruct((bsz, d_inner, d_state), jnp.float32),
    ]
    if checkpoints:
        out_specs.append(
            pl.BlockSpec((1, 1, d_inner, d_state), lambda b, c: (b, c, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, nc, d_inner, d_state), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, q, d_inner), blk, memory_space=pltpu.VMEM)
        )
        # Pre-gate y checkpoint in the COMPUTE dtype: in bf16 training it
        # halves this stream's HBM traffic; the epilogue gradient tolerance
        # already has bf16 rounding everywhere else. fp32 runs keep fp32
        # (exact-parity tests unaffected).
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, lp, d_inner), zx.dtype)
        )

    outs = pl.pallas_call(
        functools.partial(
            _ssd_kernel, nheads=nheads, hdim=hdim, ngroups=ngroups,
            d_state=d_state, highest=(zx.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps,
            fuse_conv=True, conv_width=width, d_inner=d_inner,
            conv_dim=conv_dim, checkpoints=checkpoints,
        ),
        grid=(bsz, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
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
    return outs if checkpoints else (outs[0], outs[1])


def _mixer_fwd_impl(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
                    interpret):
    from videomamba_tpu.ops.dispatch import ssd_fwd_merged_enabled

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
        merged=ssd_fwd_merged_enabled(),
    )
    return y[:, :seqlen], hlast.reshape(bsz, nheads, hdim, n)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10))
def _ssd_mixer_core(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
                    interpret):
    return _mixer_fwd_impl(zx, dt_p, A, cstate, convw, convb, h0, D, nw,
                           cfg, interpret)


def _mixer_vjp_fwd(zx, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
                   interpret):
    """Training forward: run the fused kernel WITH residual outputs — the
    per-chunk entry states (for the Pallas scan backward) and the pre-gate
    y (for the epilogue gradient) — so the backward never re-runs the scan
    forward.

    NOTE: when the merged forward runs (ngroups == 1 and
    VIDEOMAMBA_SSD_FWD_MERGED), the ``hins`` residual is TRANSPOSED
    (B, nc, N, DI); the backward rules re-read the same trace-time knob to
    interpret it."""
    from videomamba_tpu.ops.dispatch import ssd_fwd_merged_enabled

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
        cstate.astype(zx.dtype).swapaxes(1, 2)
        if cstate is not None
        else jnp.zeros((bsz, convw.shape[0], conv_dim), zx.dtype)
    )
    y, hlast, hins, yd = _ssd_mixer_padded(
        zxf, dtf.astype(jnp.float32), A.astype(jnp.float32), cst,
        convw, convb.astype(jnp.float32).reshape(1, conv_dim), h0f,
        D.astype(jnp.float32),
        (nw.astype(jnp.float32).reshape(1, d_inner) if nw is not None
         else None),
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        d_inner=d_inner, conv_dim=conv_dim, chunk_size=q,
        norm_eps=float(norm_eps), interpret=interpret, checkpoints=True,
        merged=ssd_fwd_merged_enabled(),
    )
    out = (y[:, :seqlen], hlast.reshape(bsz, nheads, hdim, n))
    return out, (zx, dtf, A, cstate, convw, convb, h0, D, nw, hins, yd)


def _decay_chain_grads(ds_col, ds_row, ddtp_col, ddtp_row, A, dtf, q):
    """Small-tensor decay chains in XLA: s = within-chunk cumsum(dt*A), so
    d(dtA) = reversed within-chunk cumsum of ds; dA and the dt_p terms
    follow by the product rule."""
    bsz, lp, nheads = ds_col.shape
    nc = lp // q
    ds = ds_col + ds_row.swapaxes(1, 2)
    ds_c = ds.reshape(bsz, nc, q, nheads)
    ddtA = jnp.flip(jnp.cumsum(jnp.flip(ds_c, 2), axis=2), 2)
    ddtA = ddtA.reshape(bsz, lp, nheads)
    ddtp = ddtp_col + ddtp_row.swapaxes(1, 2) + ddtA * A[None, None, :]
    dA = jnp.sum(ddtA * dtf, axis=(0, 1))
    return ddtp, dA


def _mixer_vjp_bwd_fused(cfg, interpret, res, cts):
    """One-kernel backward: conv recompute, epilogue/D-skip gradients, the
    reverse-chunk scan backward and the conv backward all happen inside
    ``_ssd_mixer_bwd_padded`` — the composite path's XLA glue (measured
    1.8 ms/layer at Base train shapes, more than both Pallas kernels
    combined) collapses to the tiny decay chains + per-batch reductions."""
    from videomamba_tpu.ops.dispatch import (
        ssd_bwd_merged_enabled,
        ssd_fwd_merged_enabled,
    )

    zx, dtf, A, cstate, convw, convb, h0, D, nw, hins, yd = res
    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    dout, dhlast = cts
    bsz, seqlen, _ = zx.shape
    q = int(chunk_size)
    lp = dtf.shape[1]
    has_cst = cstate is not None
    has_norm = nw is not None
    # The merged FORWARD emits the hins residual transposed (B, nc, N, DI);
    # both rules read the same trace-time knob (kernel_knob_fingerprint
    # guards long-lived caches against env flips).
    fwd_merged = ngroups == 1 and ssd_fwd_merged_enabled()

    pad = lp - seqlen
    zxf = jnp.pad(zx, ((0, 0), (0, pad), (0, 0))) if pad else zx
    doutf = jnp.pad(dout, ((0, 0), (0, pad), (0, 0))) if pad else dout
    cst = (
        cstate.astype(zx.dtype).swapaxes(1, 2)
        if has_cst
        else jnp.zeros((bsz, convw.shape[0], conv_dim), zx.dtype)
    )
    dhl = dhlast.astype(jnp.float32).reshape(bsz, nheads * hdim, n)
    outs = _ssd_mixer_bwd_padded(
        zxf, dtf, A.astype(jnp.float32), cst, convw,
        convb.astype(jnp.float32).reshape(1, conv_dim), yd, hins, doutf,
        dhl, D.astype(jnp.float32),
        (nw.astype(jnp.float32).reshape(1, d_inner) if has_norm else None),
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        d_inner=d_inner, conv_dim=conv_dim, chunk_size=q,
        norm_eps=float(norm_eps), interpret=interpret,
        merged=ssd_bwd_merged_enabled(), hins_transposed=fwd_merged,
    )
    (dzxf, ds_col, ds_row, ddtp_col, ddtp_row, dh0f, dcw_b, dcb_b,
     ddsk_b, dcst_b) = outs[:10]
    dnw = (
        jnp.sum(outs[10], axis=(0, 1)).astype(nw.dtype) if has_norm
        else None
    )

    ddtp, dA = _decay_chain_grads(ds_col, ds_row, ddtp_col, ddtp_row,
                                  A, dtf, q)
    dzx = dzxf[:, :seqlen]
    ddtp = ddtp[:, :seqlen].astype(dtf.dtype)
    dcw = jnp.sum(dcw_b, axis=0).astype(convw.dtype)
    dcb = jnp.sum(dcb_b, axis=(0, 1)).astype(convb.dtype)
    dD = jnp.sum(ddsk_b, axis=(0, 1)).reshape(nheads, hdim)
    dD = jnp.sum(dD, axis=1).astype(D.dtype)
    dcst = (
        dcst_b.swapaxes(1, 2).astype(cstate.dtype) if has_cst else None
    )
    dh0 = (
        dh0f.reshape(bsz, nheads, hdim, n).astype(h0.dtype)
        if h0 is not None else None
    )
    return (dzx, ddtp, dA.astype(A.dtype), dcst, dcw, dcb, dh0, dD, dnw)


def _mixer_vjp_bwd(cfg, interpret, res, cts):
    """Manual backward assembly. Default: the mega-fused kernel
    (:func:`_mixer_vjp_bwd_fused`). ``VIDEOMAMBA_SSD_BWD=composite`` keeps
    the original route: XLA conv recompute (cheap) -> epilogue vjp
    (elementwise) -> Pallas scan backward from the forward's checkpoints ->
    conv vjp. No scan-forward recompute either way."""
    from videomamba_tpu.ops.causal_conv1d import causal_conv1d
    from videomamba_tpu.ops.dispatch import (
        ssd_bwd_fused_enabled,
        ssd_fwd_merged_enabled,
    )
    from videomamba_tpu.ops.norm import rms_norm

    if ssd_bwd_fused_enabled():
        return _mixer_vjp_bwd_fused(cfg, interpret, res, cts)

    zx, dtf, A, cstate, convw, convb, h0, D, nw, hins, yd = res
    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    if ngroups == 1 and ssd_fwd_merged_enabled():
        # The merged forward's hins residual is transposed (B, nc, N, DI);
        # the bare scan backward wants (B, nc, DI, N).
        hins = hins.swapaxes(2, 3)
    dout, dhlast = cts
    bsz, seqlen, _ = zx.shape
    q = int(chunk_size)
    lp = dtf.shape[1]
    gn = ngroups * n

    has_cst = cstate is not None
    cst = (
        cstate if has_cst
        else jnp.zeros((bsz, conv_dim, convw.shape[0]), zx.dtype)
    )

    # 1. Conv recompute with vjp (one cheap fused XLA pass).
    z2 = zx[..., :d_inner]
    raw = zx[..., d_inner:d_inner + conv_dim]
    xbc, conv_vjp = jax.vjp(
        lambda r, w, b, c: causal_conv1d(r, w, b, activation="silu",
                                         initial_state=c),
        raw, convw, convb, cst,
    )
    x4 = xbc[..., :d_inner].reshape(bsz, seqlen, nheads, hdim)

    # 2. Epilogue vjp at the stored pre-gate y (elementwise + norm).
    yd_t = yd[:, :seqlen]

    def epilogue(yd_, z_, *maybe_nw):
        gated = yd_.astype(jnp.float32) * jax.nn.silu(z_.astype(jnp.float32))
        if maybe_nw:
            gated = rms_norm(gated, maybe_nw[0], eps=norm_eps)
        return gated.astype(zx.dtype)

    if nw is not None:
        _, epi_vjp = jax.vjp(epilogue, yd_t, z2, nw)
        dyd, dz, dnw = epi_vjp(dout)
    else:
        _, epi_vjp = jax.vjp(epilogue, yd_t, z2)
        dyd, dz = epi_vjp(dout)
        dnw = None

    # 3. D-skip split: yd = y_scan + D * x.
    dyd4 = dyd.reshape(bsz, seqlen, nheads, hdim)
    dD = jnp.sum(
        dyd4 * x4.astype(jnp.float32), axis=(0, 1, 3)
    ).astype(D.dtype)
    dx_from_d = dyd4 * D.astype(jnp.float32)[None, None, :, None]

    # 4. Pallas scan backward from the forward's checkpoints.
    xf = xbc[..., :d_inner]
    Bf = xbc[..., d_inner:d_inner + gn]
    Cf = xbc[..., d_inner + gn:]
    dyf = dyd
    if lp != seqlen:
        padw = ((0, 0), (0, lp - seqlen), (0, 0))
        xf = jnp.pad(xf, padw)
        Bf = jnp.pad(Bf, padw)
        Cf = jnp.pad(Cf, padw)
        dyf = jnp.pad(dyf, padw)
    dhl = dhlast.astype(jnp.float32).reshape(bsz, nheads * hdim, n)
    (dxf, dBf, dCf, ds_col, ds_row, ddtp_col, ddtp_row,
     dh0f) = _ssd_bwd_padded(
        xf, dtf, A.astype(jnp.float32), Bf, Cf, hins, dyf, dhl,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        chunk_size=q, interpret=interpret,
    )

    # 5. Decay-logit chains (same as the core vjp).
    ddtp, dA = _decay_chain_grads(ds_col, ds_row, ddtp_col, ddtp_row,
                                  A, dtf, q)
    dA = dA.astype(A.dtype)
    # The primal dt_p is the caller's UNPADDED tensor.
    ddtp = ddtp[:, :seqlen].astype(dtf.dtype)

    # 6. Back through the conv to the raw [x B C] slab.
    dx4 = dxf[:, :seqlen].reshape(bsz, seqlen, nheads, hdim) + dx_from_d
    dxbc = jnp.concatenate(
        [dx4.reshape(bsz, seqlen, d_inner), dBf[:, :seqlen],
         dCf[:, :seqlen]], axis=-1,
    ).astype(xbc.dtype)
    draw, dcw, dcb, dcst = conv_vjp(dxbc)

    # 7. Assemble dzx: [z | x B C | dt]; the dt lanes feed _prepare_dt
    # OUTSIDE this core, so their grad here is zero (matches the twin).
    dzx = jnp.concatenate(
        [dz.astype(zx.dtype), draw.astype(zx.dtype),
         jnp.zeros((bsz, seqlen, nheads), zx.dtype)], axis=-1,
    )
    return (dzx, ddtp, dA, (dcst if has_cst else None),
            dcw.astype(convw.dtype), dcb.astype(convb.dtype),
            (dh0f.reshape(bsz, nheads, hdim, n).astype(h0.dtype)
             if h0 is not None else None),
            dD, dnw)


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
