"""Projected-mixer Pallas kernels for the Mamba-2 (SSD) layer.

One kernel spans the whole span between the residual stream's add-norm and
the residual add: ``in_proj -> causal conv + SiLU -> SSD chunked scan ->
D-skip -> silu(z) gate -> gated RMSNorm -> out_proj``. Rationale (measured
at Base train shapes, B=4, L=1569, v5e):

* The SSD scan kernels are VPU/small-dot bound (~2.6% MXU utilization), so
  the projection matmuls (in/out_proj fwd ~0.24 ms/layer, their gradients
  ~0.45 ms/layer — all pure MXU) can ride the idle MXU slots instead of
  serializing as separate XLA ops.
* Keeping the projections in-kernel removes the zx (B, L, 2*Di+2GN+H) and
  gated (B, L, Di) HBM round trips between XLA and the mixer kernel
  (~0.2 ms/layer) plus the zxbcdt relayout copy XLA inserts before the
  pallas_call at serving shapes (~124 us/layer).
* The add-norm stays OUTSIDE (XLA): it is a cheap fused elementwise pass
  (~0.1 ms/layer) and the decay-logit tensors must be derived from the
  normed input anyway (tiny ``normed @ Win[:, -H:]`` matmul) — fusing the
  norm would force an in-kernel cumsum/scalar-extraction structure for the
  decay logits with no measurable win.

The backward kernel mirrors ssd_scan._ssd_mixer_bwd_kernel and adds the
projection gradients: it recomputes zx from the stored ``normed`` input
(one MXU dot), accumulates dWin/dWout per batch row, and emits ``dnormed``
directly. The dt lanes' gradient flows outside (softplus backward + a tiny
matmul), exactly like the mixer-level path.

Role parity: the reference's fused ``mamba_inner_fn`` spans the same
in_proj..out_proj range for Mamba-1
(/root/reference/models/videomamba/mamba_simple.py:343-435); no Mamba-2
counterpart exists in the reference (Mamba-1 only).
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


def ssd_pmixer_supported(d_model: int, nheads: int, hdim: int, ngroups: int,
                         d_state: int, chunk_size: int,
                         weight_bytes_per_el: int = 2) -> bool:
    """Shape/VMEM gate: the scan-kernel envelope plus VMEM-resident
    projection weights (Win + Wout + f32 dWin/dWout accumulators in the
    backward must fit comfortably under the raised scoped-VMEM limit)."""
    from videomamba_tpu.ops.pallas.ssd_scan import pallas_ssd_supported

    if not pallas_ssd_supported(nheads, hdim, ngroups, d_state, chunk_size):
        return False
    if d_model % 128 != 0:
        return False
    d_inner = nheads * hdim
    dpj = 2 * d_inner + 2 * ngroups * d_state + nheads
    wbytes = (d_model * dpj + d_inner * d_model) * weight_bytes_per_el
    accbytes = (d_model * dpj + d_inner * d_model) * 4
    return wbytes + accbytes <= 48 * 1024 * 1024


def _decay_tensors(dt_p, A, nc, q, nheads):
    """Per-chunk inclusive decay cumsum — tiny (B, L, H) tensors in XLA,
    fed in both (L, H) and (H, L) layouts so the kernel needs no
    transposes (same as ssd_scan)."""
    bsz, lp, _ = dt_p.shape
    dtA = dt_p * A[None, None, :]
    s = jnp.cumsum(dtA.reshape(bsz, nc, q, nheads), axis=2)
    s = s.reshape(bsz, lp, nheads)
    srow = s.swapaxes(1, 2)
    dtrow = dt_p.swapaxes(1, 2)
    s_last = s.reshape(bsz, nc, q, nheads)[:, :, -1, :]
    return s, srow, dtrow, s_last


def _ssd_pmixer_kernel(
    *refs,
    nheads: int,
    hdim: int,
    ngroups: int,
    d_state: int,
    highest: bool,
    has_norm: bool,
    norm_eps: float,
    conv_width: int,
    d_inner: int,
    conv_dim: int,
    d_model: int,
    checkpoints: bool,
):
    """Forward: normed (q, D) -> out (q, D), whole mixer core in-kernel."""
    it = iter(refs)
    xin_ref = next(it)      # (1, q, D) normed block input
    win_ref = next(it)      # (D, DPJ)
    wout_ref = next(it)     # (DI, D)
    cstate_ref = next(it)   # (1, W, CD)
    convw_ref = next(it)    # (W, CD)
    convb_ref = next(it)    # (1, CD) f32
    scol_ref = next(it)     # (1, q, H)
    srow_ref = next(it)     # (1, H, q)
    dtcol_ref = next(it)    # (1, q, H)
    dtrow_ref = next(it)    # (1, H, q)
    slast_ref = next(it)    # (B, nc, H) SMEM
    h0_ref = next(it)       # (1, DI, N)
    d_ref = next(it)        # (H,) SMEM
    nw_ref = next(it) if has_norm else None
    out_ref = next(it)      # (1, q, D)
    hlast_ref = next(it)    # (1, DI, N)
    hins_ref = next(it) if checkpoints else None
    yd_ref = next(it) if checkpoints else None
    h_scr = next(it)        # (DI, N) f32
    y_scr = next(it)        # (q, DI) f32
    xtail_scr = next(it)    # (W-1, CD) f32 raw conv tail

    c_idx = pl.program_id(1)
    n = d_state
    heads_per_group = nheads // ngroups
    prec = lax.Precision.HIGHEST if highest else None
    width = conv_width

    @pl.when(c_idx == 0)
    def _():
        h_scr[:] = h0_ref[0]

    if checkpoints:
        hins_ref[0, 0] = h_scr[:]

    xin = xin_ref[0]                        # (q, D)
    q = xin.shape[0]
    cdt = xin.dtype

    # ---- in_proj on the MXU (rides the scan's idle MXU slots), rounded to
    # the compute dtype to match the XLA path's bf16 matmul output.
    zx = lax.dot(xin, win_ref[:], precision=prec,
                 preferred_element_type=jnp.float32).astype(cdt)

    # ---- causal conv + SiLU over the [x B C] slab (prev-chunk tail as
    # left context; streaming window at chunk 0) — ssd_scan's fuse_conv.
    z_val = zx[:, :d_inner]
    raw = zx[:, d_inner:d_inner + conv_dim].astype(jnp.float32)
    state_tail = cstate_ref[0][1:, :].astype(jnp.float32)
    left = jnp.where(c_idx == 0, state_tail, xtail_scr[:])
    ctx = jnp.concatenate([left, raw], axis=0)
    xtail_scr[:] = raw[q - (width - 1):]
    cw_taps = convw_ref[:].astype(jnp.float32)
    cy = cw_taps[width - 1][None, :] * raw
    for k in range(width - 1):
        cy = cy + cw_taps[k][None, :] * ctx[k:k + q]
    cy = cy + convb_ref[:].astype(jnp.float32)
    cy = cy * jax.nn.sigmoid(cy)
    gn = conv_dim - d_inner
    x = cy[:, :d_inner].astype(cdt)
    bmat = cy[:, d_inner:d_inner + gn // 2].astype(cdt)
    cmat = cy[:, d_inner + gn // 2:].astype(cdt)

    scol = scol_ref[0]
    srow = srow_ref[0]
    dtcol = dtcol_ref[0]
    dtrow = dtrow_ref[0]

    ids_r = lax.broadcasted_iota(jnp.int32, (q, q), 0)
    ids_c = lax.broadcasted_iota(jnp.int32, (q, q), 1)
    causal = ids_r >= ids_c

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
        sc = scol[:, h:h + 1]
        sr = srow[h:h + 1, :]
        slast = slast_ref[pl.program_id(0), c_idx, h]

        seg = jnp.where(causal, sc - sr, -jnp.inf)
        m = (cbs[g] * jnp.exp(seg) * dtrow[h:h + 1, :]).astype(cdt)

        xh = x[:, h * hdim:(h + 1) * hdim]
        y_h = lax.dot_general(
            m, xh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        h_prev = h_scr[h * hdim:(h + 1) * hdim, :]
        cw = (
            cmat[:, g * n:(g + 1) * n].astype(jnp.float32) * jnp.exp(sc)
        ).astype(cdt)
        y_h = y_h + lax.dot_general(
            cw, h_prev.astype(cdt), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        y_h = y_h + d_ref[h] * xh.astype(jnp.float32)
        y_scr[:, h * hdim:(h + 1) * hdim] = y_h

        w = dtcol[:, h:h + 1] * jnp.exp(slast - sc)
        xw = (xh.astype(jnp.float32) * w).astype(cdt)
        s_h = lax.dot_general(
            xw, bmat[:, g * n:(g + 1) * n], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        h_scr[h * hdim:(h + 1) * hdim, :] = jnp.exp(slast) * h_prev + s_h

    if checkpoints:
        yd_ref[0] = y_scr[:].astype(yd_ref.dtype)
    gated = y_scr[:] * jax.nn.silu(z_val.astype(jnp.float32))
    if has_norm:
        var = jnp.mean(jnp.square(gated), axis=1, keepdims=True)
        gated = gated * lax.rsqrt(var + norm_eps) * nw_ref[:].astype(
            jnp.float32
        )

    # ---- out_proj on the MXU.
    out = lax.dot(gated.astype(cdt), wout_ref[:], precision=prec,
                  preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)
    hlast_ref[0] = h_scr[:]

def _ssd_pmixer_fwd_merged_kernel(
    xin_ref,      # (1, q, D) normed block input
    win_ref,      # (D, DPJ)
    wout_ref,     # (DI, D)
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
    d_model: int,
    checkpoints: bool,
):
    """MXU-merged projected-mixer forward (ngroups == 1): in_proj, conv +
    SiLU, the merged chunk walk (ssd_scan._merged_scan_fwd_core), gate
    (+RMSNorm), out_proj — same contract as :func:`_ssd_pmixer_kernel`
    except the state (h0/hlast/hins) is TRANSPOSED (N, DI)."""
    from videomamba_tpu.ops.pallas.ssd_scan import _merged_scan_fwd_core

    it = iter(maybe_nw_and_outs)
    nw_ref = next(it) if has_norm else None
    out_ref = next(it)      # (1, q, D)
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
        hins_ref[0, 0] = hT_scr[:]

    xin = xin_ref[0]                        # (q, D)
    q = xin.shape[0]
    cdt = xin.dtype

    # ---- in_proj (MXU) + conv/SiLU (identical to the per-head kernel).
    zx = lax.dot(xin, win_ref[:], precision=prec,
                 preferred_element_type=f32).astype(cdt)
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

    # ---- epilogue + out_proj (MXU).
    if checkpoints:
        yd_ref[0] = yd.astype(yd_ref.dtype)
    gated = yd * jax.nn.silu(z_val.astype(f32))
    if has_norm:
        var = jnp.mean(jnp.square(gated), axis=1, keepdims=True)
        gated = gated * lax.rsqrt(var + norm_eps) * nw_ref[:].astype(f32)
    out = lax.dot(gated.astype(cdt), wout_ref[:], precision=prec,
                  preferred_element_type=f32)
    out_ref[0] = out.astype(out_ref.dtype)
    hlast_ref[0] = hT_scr[:]


def _ssd_pmixer_fwd_merged(
    xin, dt_p, A, cstate, win, wout, convw, convb, h0, D, norm_weight, *,
    nheads, hdim, d_state, d_inner, conv_dim, chunk_size, norm_eps,
    interpret, checkpoints,
):
    """pallas_call wrapper for the merged projected-mixer forward
    (ngroups == 1). Same contract as the per-head path inside
    :func:`_ssd_pmixer_fwd_padded` EXCEPT the hins checkpoint comes out
    TRANSPOSED (B, nc, N, DI) — the merged backward's native layout.
    hlast is transposed back to (B, DI, N) in XLA."""
    bsz, lp, d_model = xin.shape
    q = chunk_size
    nc = lp // q
    width = convw.shape[0]
    has_norm = norm_weight is not None
    dpj = win.shape[1]

    s, srow, dtrow, _ = _decay_tensors(dt_p, A, nc, q, nheads)
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
        pl.BlockSpec((1, q, d_model), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_model, dpj), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_inner, d_model), fixed2, memory_space=pltpu.VMEM),
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
    operands = [xin, win, wout, cstate, convw, convb, s, srow, dt_p,
                dtrow, s_last, h0T, d_hp, onehot]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, d_model), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_state, d_inner), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, d_model), xin.dtype),
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
        # Pre-gate y checkpoint in the compute dtype (see ssd_scan).
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, lp, d_inner), xin.dtype)
        )

    outs = pl.pallas_call(
        functools.partial(
            _ssd_pmixer_fwd_merged_kernel, nheads=nheads, hdim=hdim,
            d_state=d_state, highest=(xin.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps, conv_width=width,
            d_inner=d_inner, conv_dim=conv_dim, d_model=d_model,
            checkpoints=checkpoints,
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
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    outs = list(outs)
    outs[1] = outs[1].swapaxes(1, 2)  # hlast: (B, N, DI) -> (B, DI, N)
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret", "norm_eps", "d_inner", "conv_dim",
                     "checkpoints", "merged"),
)
def _ssd_pmixer_fwd_padded(
    xin: Array,      # (B, Lp, D) normed block input, Lp % q == 0
    dt_p: Array,     # (B, Lp, H) f32 post-softplus (0 on padded rows)
    A: Array,        # (H,) f32 negative
    cstate: Array,   # (B, W, CD) raw-input window (time-major)
    win: Array,      # (D, DPJ)
    wout: Array,     # (DI, D)
    convw: Array,    # (W, CD)
    convb: Array,    # (1, CD) f32
    h0: Array,       # (B, DI, N) f32
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
    checkpoints: bool = False,
    merged: Optional[bool] = None,
):
    # ``merged`` is static (part of the jit key); see _ssd_pmixer_bwd_padded.
    # The merged path's hins checkpoint output is TRANSPOSED (B, nc, N, DI).
    if merged is None:
        from videomamba_tpu.ops.dispatch import ssd_fwd_merged_enabled

        merged = ssd_fwd_merged_enabled()
    if ngroups == 1 and merged:
        return _ssd_pmixer_fwd_merged(
            xin, dt_p, A, cstate, win, wout, convw, convb, h0, D,
            norm_weight, nheads=nheads, hdim=hdim, d_state=d_state,
            d_inner=d_inner, conv_dim=conv_dim, chunk_size=chunk_size,
            norm_eps=norm_eps, interpret=interpret, checkpoints=checkpoints,
        )

    bsz, lp, d_model = xin.shape
    q = chunk_size
    nc = lp // q
    width = convw.shape[0]
    has_norm = norm_weight is not None
    dpj = win.shape[1]

    s, srow, dtrow, s_last = _decay_tensors(dt_p, A, nc, q, nheads)

    blk = lambda b, c: (b, c, 0)
    fixed = lambda b, c: (b, 0, 0)
    row = lambda b, c: (b, 0, c)
    fixed2 = lambda b, c: (0, 0)

    in_specs = [
        pl.BlockSpec((1, q, d_model), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_model, dpj), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_inner, d_model), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((width, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), row, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), row, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # s_last
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # D
    ]
    operands = [xin, win, wout, cstate, convw, convb, s, srow, dt_p,
                dtrow, s_last, h0, D.astype(jnp.float32)]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, d_model), blk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, d_model), xin.dtype),
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
        # Pre-gate y checkpoint in the compute dtype (see ssd_scan).
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, lp, d_inner), xin.dtype)
        )

    outs = pl.pallas_call(
        functools.partial(
            _ssd_pmixer_kernel, nheads=nheads, hdim=hdim, ngroups=ngroups,
            d_state=d_state, highest=(xin.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps, conv_width=width,
            d_inner=d_inner, conv_dim=conv_dim, d_model=d_model,
            checkpoints=checkpoints,
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
            # VMEM-resident projection weights + streams exceed the 16MB
            # scoped default at Base shapes; v5e has far more physical VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return outs

def _ssd_pmixer_bwd_kernel(
    # inputs (chunk-indexed refs use REVERSED index maps)
    xin_ref,     # (1, q, D) normed block input (current chunk)
    xinprev_ref,  # (1, q, D) previous chunk (conv left context via in_proj)
    win_ref,     # (D, DPJ)
    wout_ref,    # (DI, D)
    cstate_ref,  # (1, W, CD)
    convw_ref,   # (W, CD)
    convb_ref,   # (1, CD) f32
    yd_ref,      # (1, q, DI) pre-gate y checkpoint
    dout_ref,    # (1, q, D) cotangent of the mixer output
    scol_ref,    # (1, q, H) f32
    srow_ref,    # (1, H, q) f32
    dtcol_ref,   # (1, q, H) f32
    dtrow_ref,   # (1, H, q) f32
    slast_ref,   # (B, nc, H) f32 SMEM (absolute chunk index)
    hins_ref,    # (1, 1, DI, N) f32
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
    d_model: int,
):
    """Whole projected-mixer backward in ONE kernel: zx recompute (MXU),
    out_proj gradient + dgated, epilogue backward, reverse-chunk scan
    backward, conv backward, in_proj gradient + dnormed."""
    it = iter(maybe_nw_and_outs)
    nw_ref = next(it) if has_norm else None
    # outputs
    dxin_ref = next(it)     # (1, q, D) dnormed (in-kernel part)
    dscol_ref = next(it)    # (1, q, H) f32
    dsrow_ref = next(it)    # (1, H, q) f32
    ddtpcol_ref = next(it)  # (1, q, H) f32
    ddtprow_ref = next(it)  # (1, H, q) f32
    dh0_ref = next(it)      # (1, DI, N) f32
    dwin_ref = next(it)     # (1, D, DPJ) f32 per-batch partial
    dwout_ref = next(it)    # (1, DI, D) f32 per-batch partial
    dcw_ref = next(it)      # (1, W, CD) f32 per-batch partial
    dcb_ref = next(it)      # (1, 1, CD) f32 per-batch partial
    ddsk_ref = next(it)     # (1, 1, DI) f32 per-batch partial (D grads)
    dcst_ref = next(it)     # (1, W, CD) f32 conv-state gradient
    dnw_ref = next(it) if has_norm else None  # (1, 1, DI) f32
    # scratch
    g_scr = next(it)        # (DI, N) f32 state cotangent carry
    carry_scr = next(it)    # (8, CD) f32 next chunk's head rows of dcpre
    ddsk_scr = next(it)     # (1, DI) f32
    dcb_scr = next(it)      # (1, CD) f32
    dcw_scr = next(it)      # (8, CD) f32 (W rows used)
    dwin_scr = next(it)     # (D, DPJ) f32
    dwout_scr = next(it)    # (DI, D) f32
    dnw_scr = next(it) if has_norm else None  # (1, DI) f32

    c_idx = pl.program_id(1)
    chunk = nc - 1 - c_idx
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
        dwin_scr[:] = jnp.zeros_like(dwin_scr)
        dwout_scr[:] = jnp.zeros_like(dwout_scr)
        if has_norm:
            dnw_scr[:] = jnp.zeros_like(dnw_scr)

    xin = xin_ref[0]                        # (q, D)
    q = xin.shape[0]
    cdt = xin.dtype

    # ---- 1. zx recompute (MXU) + conv/SiLU recompute; the conv left
    # context needs only the previous chunk's last W-1 raw rows — one tiny
    # (W-1, D)@(D, CD) dot against the in_proj slab.
    zx = lax.dot(xin, win_ref[:], precision=prec,
                 preferred_element_type=jnp.float32).astype(cdt)
    raw = zx[:, d_inner:d_inner + conv_dim].astype(jnp.float32)
    prev_tail_in = xinprev_ref[0][q - (width - 1):, :]
    prev_raw = lax.dot(
        prev_tail_in, win_ref[:, d_inner:d_inner + conv_dim],
        precision=prec, preferred_element_type=jnp.float32,
    ).astype(cdt).astype(jnp.float32)
    state_tail = cstate_ref[0][1:, :].astype(jnp.float32)
    left = jnp.where(chunk == 0, state_tail, prev_raw)
    ctx = jnp.concatenate([left, raw], axis=0)
    cw_taps = convw_ref[:].astype(jnp.float32)
    cy_pre = cw_taps[width - 1][None, :] * raw
    for k in range(width - 1):
        cy_pre = cy_pre + cw_taps[k][None, :] * ctx[k:k + q]
    cy_pre = cy_pre + convb_ref[:].astype(jnp.float32)
    sig_c = jax.nn.sigmoid(cy_pre)
    xbc = cy_pre * sig_c
    gn = ngroups * n
    x = xbc[:, :d_inner].astype(cdt)
    bmat = xbc[:, d_inner:d_inner + gn].astype(cdt)
    cmat = xbc[:, d_inner + gn:].astype(cdt)

    # ---- 2. gate/RMSNorm recompute -> dWout and dgated (MXU).
    z_val = zx[:, :d_inner].astype(jnp.float32)
    yd = yd_ref[0].astype(jnp.float32)
    sig_z = jax.nn.sigmoid(z_val)
    silu_z = z_val * sig_z
    gate = yd * silu_z
    dout = dout_ref[0]
    wg = jnp.float32 if highest else cdt
    if has_norm:
        var = jnp.mean(jnp.square(gate), axis=1, keepdims=True)
        r = lax.rsqrt(var + norm_eps)
        xn = gate * r
        gated = xn * nw_ref[:].astype(jnp.float32)
    else:
        gated = gate
    dwout_scr[:] += lax.dot_general(
        gated.astype(wg), dout.astype(wg), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dgated = lax.dot_general(
        dout.astype(cdt), wout_ref[:], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    )                                       # (q, DI) f32

    # ---- 3. epilogue backward at the stored pre-gate y.
    if has_norm:
        dnw_scr[:] += jnp.sum(dgated * xn, axis=0, keepdims=True)
        dxn = dgated * nw_ref[:].astype(jnp.float32)
        dot_row = jnp.sum(dxn * gate, axis=1, keepdims=True)
        dgate = dxn * r - gate * (r * r * r / d_inner) * dot_row
    else:
        dgate = dgated
    dyd = dgate * silu_z
    dz = dgate * yd * (sig_z * (1.0 + z_val * (1.0 - sig_z)))

    # ---- 4. D-skip.
    ddsk_scr[:] += jnp.sum(dyd * xbc[:, :d_inner], axis=0, keepdims=True)

    scol = scol_ref[0]
    srow = srow_ref[0]
    dtcol = dtcol_ref[0]
    dtrow = dtrow_ref[0]
    hin = hins_ref[0, 0]

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

    # ---- 5. reverse-chunk scan backward (math identical to
    # ssd_scan._ssd_bwd_kernel, dy := dyd).
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
        dy_h = dyd[:, hsl]
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

        dx_heads.append(dx_h + d_ref[h] * dy_h)
        g_scr[hsl, :] = dhin + jnp.exp(slast) * g_h

    dh0_ref[0] = g_scr[:]

    # ---- 6. conv backward through SiLU to the raw [x B C] slab.
    dxbc = jnp.concatenate(dx_heads + db_groups + dc_groups, axis=1)
    dcpre = dxbc * (sig_c * (1.0 + cy_pre * (1.0 - sig_c)))
    dcb_scr[:] += jnp.sum(dcpre, axis=0, keepdims=True)
    for k in range(width):
        dcw_scr[k, :] += jnp.sum(dcpre * ctx[k:k + q], axis=0)

    dcpre_ext = jnp.concatenate([dcpre, carry_scr[:width - 1]], axis=0)
    draw = cw_taps[width - 1][None, :] * dcpre
    for m2 in range(1, width):
        draw = draw + cw_taps[width - 1 - m2][None, :] * dcpre_ext[
            m2:m2 + q]
    carry_scr[:width - 1] = dcpre[:width - 1]

    @pl.when(chunk == 0)
    def _():
        dcst_ref[0] = jnp.zeros_like(dcst_ref[0])
        for rr in range(width - 1):
            acc = jnp.zeros((conv_dim,), jnp.float32)
            for k in range(width):
                t = rr - k
                if 0 <= t < width - 1:
                    acc = acc + cw_taps[k] * dcpre[t]
            dcst_ref[0, rr + 1] = acc

    # ---- 7. dzx -> in_proj gradient + dnormed (MXU).
    dzx = jnp.concatenate(
        [dz, draw,
         jnp.zeros((q, win_ref.shape[1] - d_inner - conv_dim),
                   jnp.float32)], axis=1,
    )                                       # (q, DPJ) f32; dt lanes outside
    dzx_c = dzx.astype(cdt)
    dxin_ref[0] = lax.dot_general(
        dzx_c, win_ref[:], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=jnp.float32,
    ).astype(dxin_ref.dtype)
    dwin_scr[:] += lax.dot_general(
        xin.astype(wg), dzx.astype(wg), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # Flush the weight-gradient accumulators once per batch row (the output
    # blocks only leave VMEM when the b index changes, but an unconditional
    # write would still copy ~14.6 MB of f32 VMEM every chunk step).
    @pl.when(c_idx == nc - 1)
    def _():
        dwin_ref[0] = dwin_scr[:]
        dwout_ref[0] = dwout_scr[:]
        dcw_ref[0] = dcw_scr[:width]
        dcb_ref[0, 0] = dcb_scr[0]
        ddsk_ref[0, 0] = ddsk_scr[0]
        if has_norm:
            dnw_ref[0, 0] = dnw_scr[0]

@functools.partial(
    jax.jit,
    static_argnames=("nheads", "hdim", "ngroups", "d_state", "chunk_size",
                     "interpret", "norm_eps", "d_inner", "conv_dim",
                     "merged", "hins_transposed"),
)
def _ssd_pmixer_bwd_padded(
    xin: Array,      # (B, Lp, D) normed block input
    dt_p: Array,     # (B, Lp, H) f32 post-softplus (0 on padded rows)
    A: Array,        # (H,) f32 negative
    cstate: Array,   # (B, W, CD) raw-input window (time-major)
    win: Array,      # (D, DPJ)
    wout: Array,     # (DI, D)
    convw: Array,    # (W, CD)
    convb: Array,    # (1, CD) f32
    yd: Array,       # (B, Lp, DI) pre-gate y checkpoint
    hins: Array,     # (B, nc, DI, N) f32
    dout: Array,     # (B, Lp, D) cotangent of the mixer output
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
        return _ssd_pmixer_bwd_merged(
            xin, dt_p, A, cstate, win, wout, convw, convb, yd, hins, dout,
            dhlast, D, norm_weight, nheads=nheads, hdim=hdim,
            d_state=d_state, d_inner=d_inner, conv_dim=conv_dim,
            chunk_size=chunk_size, norm_eps=norm_eps, interpret=interpret,
            hins_transposed=hins_transposed,
        )
    if hins_transposed:
        hins = hins.swapaxes(2, 3)  # back to the per-head (B, nc, DI, N)

    bsz, lp, d_model = xin.shape
    q = chunk_size
    nc = lp // q
    width = convw.shape[0]
    has_norm = norm_weight is not None
    dpj = win.shape[1]

    s, srow, dtrow, s_last = _decay_tensors(dt_p, A, nc, q, nheads)

    rblk = lambda b, c: (b, nc - 1 - c, 0)
    rprev = lambda b, c: (b, jnp.maximum(nc - 1 - c - 1, 0), 0)
    rrow = lambda b, c: (b, 0, nc - 1 - c)
    rchunk = lambda b, c: (b, nc - 1 - c, 0, 0)
    fixed = lambda b, c: (b, 0, 0)
    fixed2 = lambda b, c: (0, 0)

    in_specs = [
        pl.BlockSpec((1, q, d_model), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_model), rprev, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_model, dpj), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_inner, d_model), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((width, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_inner), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_model), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # s_last
        pl.BlockSpec((1, 1, d_inner, d_state), rchunk,
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),  # D
    ]
    operands = [xin, xin, win, wout, cstate, convw, convb, yd, dout, s,
                srow, dt_p, dtrow, s_last, hins, dhlast,
                D.astype(jnp.float32)]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, d_model), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_state), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_model, dpj), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_model), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, d_model), xin.dtype),       # dxin
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # dscol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # dsrow
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # ddtpcol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # ddtprow
        jax.ShapeDtypeStruct((bsz, d_inner, d_state), jnp.float32),  # dh0
        jax.ShapeDtypeStruct((bsz, d_model, dpj), jnp.float32),    # dWin
        jax.ShapeDtypeStruct((bsz, d_inner, d_model), jnp.float32),  # dWout
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
        pltpu.VMEM((d_inner, d_state), jnp.float32),   # g
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcpre head carry
        pltpu.VMEM((1, d_inner), jnp.float32),         # dD acc
        pltpu.VMEM((1, conv_dim), jnp.float32),        # dcb acc
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcw acc
        pltpu.VMEM((d_model, dpj), jnp.float32),       # dWin acc
        pltpu.VMEM((d_inner, d_model), jnp.float32),   # dWout acc
    ]
    if has_norm:
        scratch.append(pltpu.VMEM((1, d_inner), jnp.float32))  # dnw acc

    outs = pl.pallas_call(
        functools.partial(
            _ssd_pmixer_bwd_kernel, nheads=nheads, hdim=hdim,
            ngroups=ngroups, d_state=d_state, nc=nc,
            highest=(xin.dtype == jnp.float32), has_norm=has_norm,
            norm_eps=norm_eps, conv_width=width, d_inner=d_inner,
            conv_dim=conv_dim, d_model=d_model,
        ),
        grid=(bsz, nc),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            # Weights + f32 dWin/dWout accumulators + streams far exceed
            # the 16MB scoped default; v5e has 128MB physical VMEM.
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*operands)
    return outs

def _ssd_pmixer_bwd_merged_kernel(
    xin_ref,      # (1, q, D) normed block input (current chunk)
    xinprev_ref,  # (1, q, D) previous chunk (conv left context via in_proj)
    win_ref,      # (D, DPJ)
    wout_ref,     # (DI, D)
    cstate_ref,   # (1, W, CD)
    convw_ref,    # (W, CD)
    convb_ref,    # (1, CD) f32
    yd_ref,       # (1, q, DI) pre-gate y checkpoint
    dout_ref,     # (1, q, D) cotangent of the mixer output
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
    d_model: int,
):
    """MXU-merged projected-mixer backward (the ngroups == 1 fast path).

    Same contract as :func:`_ssd_pmixer_bwd_kernel`; the reverse-chunk scan
    backward runs through :func:`ssd_scan._merged_scan_bwd_core`, which
    replaces the per-head small-dot chain with a few big MXU dots (see its
    docstring). The projection-gradient structure (zx recompute, dWout/dWin
    accumulators, dnormed emission) is unchanged.
    """
    from videomamba_tpu.ops.pallas.ssd_scan import _merged_scan_bwd_core

    it = iter(maybe_nw_and_outs)
    nw_ref = next(it) if has_norm else None
    dxin_ref = next(it)     # (1, q, D) dnormed (in-kernel part)
    dscol_ref = next(it)    # (1, q, H) f32
    dsrow_ref = next(it)    # (1, H, q) f32
    ddtpcol_ref = next(it)  # (1, q, H) f32
    ddtprow_ref = next(it)  # (1, H, q) f32
    dh0_ref = next(it)      # (1, N, DI) f32 (transposed)
    dwin_ref = next(it)     # (1, D, DPJ) f32 per-batch partial
    dwout_ref = next(it)    # (1, DI, D) f32 per-batch partial
    dcw_ref = next(it)      # (1, W, CD) f32 per-batch partial
    dcb_ref = next(it)      # (1, 1, CD) f32 per-batch partial
    ddsk_ref = next(it)     # (1, 1, DI) f32 per-batch partial (D grads)
    dcst_ref = next(it)     # (1, W, CD) f32 conv-state gradient
    dnw_ref = next(it) if has_norm else None  # (1, 1, DI) f32
    g_scr = next(it)        # (N, DI) f32 state cotangent carry (TRANSPOSED)
    carry_scr = next(it)    # (8, CD) f32 next chunk's head rows of dcpre
    ddsk_scr = next(it)     # (1, DI) f32
    dcb_scr = next(it)      # (1, CD) f32
    dcw_scr = next(it)      # (8, CD) f32 (W rows used)
    dwin_scr = next(it)     # (D, DPJ) f32
    dwout_scr = next(it)    # (DI, D) f32
    dnw_scr = next(it) if has_norm else None  # (1, DI) f32

    c_idx = pl.program_id(1)
    chunk = nc - 1 - c_idx
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
        dwin_scr[:] = jnp.zeros_like(dwin_scr)
        dwout_scr[:] = jnp.zeros_like(dwout_scr)
        if has_norm:
            dnw_scr[:] = jnp.zeros_like(dnw_scr)

    xin = xin_ref[0]                        # (q, D)
    q = xin.shape[0]
    cdt = xin.dtype

    # ---- 1. zx recompute (MXU) + conv/SiLU recompute (identical to the
    # per-head kernel).
    zx = lax.dot(xin, win_ref[:], precision=prec,
                 preferred_element_type=f32).astype(cdt)
    raw = zx[:, d_inner:d_inner + conv_dim].astype(f32)
    prev_tail_in = xinprev_ref[0][q - (width - 1):, :]
    prev_raw = lax.dot(
        prev_tail_in, win_ref[:, d_inner:d_inner + conv_dim],
        precision=prec, preferred_element_type=f32,
    ).astype(cdt).astype(f32)
    state_tail = cstate_ref[0][1:, :].astype(f32)
    left = jnp.where(chunk == 0, state_tail, prev_raw)
    ctx = jnp.concatenate([left, raw], axis=0)
    cw_taps = convw_ref[:].astype(f32)
    cy_pre = cw_taps[width - 1][None, :] * raw
    for k in range(width - 1):
        cy_pre = cy_pre + cw_taps[k][None, :] * ctx[k:k + q]
    cy_pre = cy_pre + convb_ref[:].astype(f32)
    sig_c = jax.nn.sigmoid(cy_pre)
    xbc = cy_pre * sig_c
    x = xbc[:, :d_inner].astype(cdt)
    x_f = xbc[:, :d_inner]
    bmat = xbc[:, d_inner:d_inner + n].astype(cdt)
    cmat = xbc[:, d_inner + n:].astype(cdt)

    # ---- 2. gate/RMSNorm recompute -> dWout and dgated (MXU).
    z_val = zx[:, :d_inner].astype(f32)
    yd = yd_ref[0].astype(f32)
    sig_z = jax.nn.sigmoid(z_val)
    silu_z = z_val * sig_z
    gate = yd * silu_z
    dout = dout_ref[0]
    wg = f32 if highest else cdt
    if has_norm:
        var = jnp.mean(jnp.square(gate), axis=1, keepdims=True)
        r = lax.rsqrt(var + norm_eps)
        xn = gate * r
        gated = xn * nw_ref[:].astype(f32)
    else:
        gated = gate
    dwout_scr[:] += lax.dot_general(
        gated.astype(wg), dout.astype(wg), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )
    dgated = lax.dot_general(
        dout.astype(cdt), wout_ref[:], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=f32,
    )                                       # (q, DI) f32

    # ---- 3. epilogue backward at the stored pre-gate y.
    if has_norm:
        dnw_scr[:] += jnp.sum(dgated * xn, axis=0, keepdims=True)
        dxn = dgated * nw_ref[:].astype(f32)
        dot_row = jnp.sum(dxn * gate, axis=1, keepdims=True)
        dgate = dxn * r - gate * (r * r * r / d_inner) * dot_row
    else:
        dgate = dgated
    dyd = dgate * silu_z
    dz = dgate * yd * (sig_z * (1.0 + z_val * (1.0 - sig_z)))

    # ---- 4. D-skip.
    ddsk_scr[:] += jnp.sum(dyd * x_f, axis=0, keepdims=True)

    # ---- 5. MXU-merged reverse-chunk scan backward (shared core).
    dxbc = _merged_scan_bwd_core(
        x=x, x_f=x_f, bmat=bmat, cmat=cmat, dyd=dyd,
        scol=scol_ref[0], srow=srow_ref[0], dtcol=dtcol_ref[0],
        dtrow=dtrow_ref[0], slast_row=slastrow_ref[0, 0],
        hinT=hins_ref[0, 0], onehot=onehot_ref[:], dhp=dhp_ref[:],
        g_scr=g_scr, dscol_ref=dscol_ref, dsrow_ref=dsrow_ref,
        ddtpcol_ref=ddtpcol_ref, ddtprow_ref=ddtprow_ref, dh0_ref=dh0_ref,
        nheads=nheads, hdim=hdim, prec=prec, cdt=cdt,
    )

    # ---- 6. conv backward through SiLU to the raw [x B C] slab.
    dcpre = dxbc * (sig_c * (1.0 + cy_pre * (1.0 - sig_c)))
    dcb_scr[:] += jnp.sum(dcpre, axis=0, keepdims=True)
    for k in range(width):
        dcw_scr[k, :] += jnp.sum(dcpre * ctx[k:k + q], axis=0)

    dcpre_ext = jnp.concatenate([dcpre, carry_scr[:width - 1]], axis=0)
    draw = cw_taps[width - 1][None, :] * dcpre
    for m2 in range(1, width):
        draw = draw + cw_taps[width - 1 - m2][None, :] * dcpre_ext[
            m2:m2 + q]
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

    # ---- 7. dzx -> in_proj gradient + dnormed (MXU).
    dzx = jnp.concatenate(
        [dz, draw,
         jnp.zeros((q, win_ref.shape[1] - d_inner - conv_dim), f32)],
        axis=1,
    )                                       # (q, DPJ) f32; dt lanes outside
    dzx_c = dzx.astype(cdt)
    dxin_ref[0] = lax.dot_general(
        dzx_c, win_ref[:], (((1,), (1,)), ((), ())),
        precision=prec, preferred_element_type=f32,
    ).astype(dxin_ref.dtype)
    dwin_scr[:] += lax.dot_general(
        xin.astype(wg), dzx.astype(wg), (((0,), (0,)), ((), ())),
        preferred_element_type=f32,
    )

    @pl.when(c_idx == nc - 1)
    def _():
        dwin_ref[0] = dwin_scr[:]
        dwout_ref[0] = dwout_scr[:]
        dcw_ref[0] = dcw_scr[:width]
        dcb_ref[0, 0] = dcb_scr[0]
        ddsk_ref[0, 0] = ddsk_scr[0]
        if has_norm:
            dnw_ref[0, 0] = dnw_scr[0]


def _ssd_pmixer_bwd_merged(
    xin, dt_p, A, cstate, win, wout, convw, convb, yd, hins, dout, dhlast,
    D, norm_weight, *, nheads, hdim, d_state, d_inner, conv_dim,
    chunk_size, norm_eps, interpret, hins_transposed=False,
):
    """pallas_call wrapper for the merged projected-mixer backward
    (ngroups == 1). Same operand/output contract as the per-head path in
    :func:`_ssd_pmixer_bwd_padded`; state tensors are transposed to the
    (N, DI) layout at the XLA level (cheap relayouts of small tensors)."""
    bsz, lp, d_model = xin.shape
    q = chunk_size
    nc = lp // q
    width = convw.shape[0]
    has_norm = norm_weight is not None
    dpj = win.shape[1]

    s, srow, dtrow, _ = _decay_tensors(dt_p, A, nc, q, nheads)
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
        pl.BlockSpec((1, q, d_model), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_model), rprev, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_model, dpj), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d_inner, d_model), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((width, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, conv_dim), fixed2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_inner), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, d_model), rblk, memory_space=pltpu.VMEM),
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
    operands = [xin, xin, win, wout, cstate, convw, convb, yd, dout, s,
                srow, dt_p, dtrow, s_last, hinsT, dhlT, d_hp, onehot]
    if has_norm:
        in_specs.append(
            pl.BlockSpec((1, d_inner), fixed2, memory_space=pltpu.VMEM)
        )
        operands.append(norm_weight)

    out_specs = [
        pl.BlockSpec((1, q, d_model), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, q, nheads), rblk, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, nheads, q), rrow, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_state, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_model, dpj), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d_inner, d_model), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, conv_dim), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, d_inner), fixed, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, width, conv_dim), fixed, memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lp, d_model), xin.dtype),       # dxin
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # dscol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # dsrow
        jax.ShapeDtypeStruct((bsz, lp, nheads), jnp.float32),      # ddtpcol
        jax.ShapeDtypeStruct((bsz, nheads, lp), jnp.float32),      # ddtprow
        jax.ShapeDtypeStruct((bsz, d_state, d_inner), jnp.float32),  # dh0T
        jax.ShapeDtypeStruct((bsz, d_model, dpj), jnp.float32),    # dWin
        jax.ShapeDtypeStruct((bsz, d_inner, d_model), jnp.float32),  # dWout
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
        pltpu.VMEM((1, d_inner), jnp.float32),         # dD acc
        pltpu.VMEM((1, conv_dim), jnp.float32),        # dcb acc
        pltpu.VMEM((8, conv_dim), jnp.float32),        # dcw acc
        pltpu.VMEM((d_model, dpj), jnp.float32),       # dWin acc
        pltpu.VMEM((d_inner, d_model), jnp.float32),   # dWout acc
    ]
    if has_norm:
        scratch.append(pltpu.VMEM((1, d_inner), jnp.float32))  # dnw acc

    outs = pl.pallas_call(
        functools.partial(
            _ssd_pmixer_bwd_merged_kernel, nheads=nheads, hdim=hdim,
            d_state=d_state, nc=nc, highest=(xin.dtype == jnp.float32),
            has_norm=has_norm, norm_eps=norm_eps, conv_width=width,
            d_inner=d_inner, conv_dim=conv_dim, d_model=d_model,
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


def _pmixer_fwd_impl(xin, dt_p, A, cstate, win, wout, convw, convb, h0, D,
                     nw, cfg, interpret):
    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    bsz, seqlen, d_model = xin.shape
    q = int(chunk_size)
    pad = (-seqlen) % q
    xf = jnp.pad(xin, ((0, 0), (0, pad), (0, 0))) if pad else xin
    dtf = jnp.pad(dt_p, ((0, 0), (0, pad), (0, 0))) if pad else dt_p
    h0f = (
        h0.astype(jnp.float32).reshape(bsz, nheads * hdim, n)
        if h0 is not None
        else jnp.zeros((bsz, nheads * hdim, n), jnp.float32)
    )
    cst = (
        cstate.astype(xin.dtype).swapaxes(1, 2)  # (B, CD, W) -> (B, W, CD)
        if cstate is not None
        else jnp.zeros((bsz, convw.shape[0], conv_dim), xin.dtype)
    )
    nwr = (nw.astype(jnp.float32).reshape(1, d_inner)
           if nw is not None else None)
    return (xf, dtf.astype(jnp.float32), h0f, cst, nwr, bsz, seqlen, q)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def _pmixer_core(xin, dt_p, A, cstate, win, wout, convw, convb, h0, D, nw,
                 cfg, interpret):
    from videomamba_tpu.ops.dispatch import ssd_fwd_merged_enabled

    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    xf, dtf, h0f, cst, nwr, bsz, seqlen, q = _pmixer_fwd_impl(
        xin, dt_p, A, cstate, win, wout, convw, convb, h0, D, nw, cfg,
        interpret)
    out, hlast = _ssd_pmixer_fwd_padded(
        xf, dtf, A.astype(jnp.float32), cst, win, wout, convw,
        convb.astype(jnp.float32).reshape(1, conv_dim), h0f,
        D.astype(jnp.float32), nwr,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        d_inner=d_inner, conv_dim=conv_dim, chunk_size=q,
        norm_eps=float(norm_eps), interpret=interpret,
        merged=ssd_fwd_merged_enabled(),
    )
    return out[:, :seqlen], hlast.reshape(bsz, nheads, hdim, n)


def _pmixer_vjp_fwd(xin, dt_p, A, cstate, win, wout, convw, convb, h0, D,
                    nw, cfg, interpret):
    """Training forward for the projected-mixer op.

    Route ``"mixer"`` (default, :func:`ssd_train_route`): run the
    DECOMPOSED path — the full in_proj as one XLA matmul, the mixer core
    (with residual checkpoints) via :func:`ssd_scan._mixer_vjp_fwd`, and
    the out_proj as another XLA matmul. With the MXU-merged core kernels
    the scan has few idle MXU slots, so standalone MXU-peak projection
    matmuls beat the fused pmixer pair under differentiation (Base m2
    train 50.5 vs 62.4 ms). The fused kernel still serves the primal
    (inference) call.

    Route ``"pmixer"``: the original one-kernel pair (A/B + fallback).
    Both rules read the same trace-time knob; it is part of
    ``kernel_knob_fingerprint`` so long-lived jit caches re-trace on flips.
    """
    from videomamba_tpu.ops.dispatch import (
        ssd_fwd_merged_enabled,
        ssd_train_route,
    )

    if ssd_train_route() == "mixer":
        from videomamba_tpu.ops.pallas.ssd_scan import (
            _mixer_vjp_fwd as _mx_fwd,
        )

        zxbcdt = xin @ win
        (gated, hlast), mres = _mx_fwd(
            zxbcdt, dt_p, A, cstate, convw, convb, h0, D, nw, cfg,
            interpret)
        out = gated @ wout
        return (out, hlast), (xin, gated, win, wout, mres)

    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    xf, dtf, h0f, cst, nwr, bsz, seqlen, q = _pmixer_fwd_impl(
        xin, dt_p, A, cstate, win, wout, convw, convb, h0, D, nw, cfg,
        interpret)
    out, hlast, hins, yd = _ssd_pmixer_fwd_padded(
        xf, dtf, A.astype(jnp.float32), cst, win, wout, convw,
        convb.astype(jnp.float32).reshape(1, conv_dim), h0f,
        D.astype(jnp.float32), nwr,
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        d_inner=d_inner, conv_dim=conv_dim, chunk_size=q,
        norm_eps=float(norm_eps), interpret=interpret, checkpoints=True,
        merged=ssd_fwd_merged_enabled(),
    )
    res = (xin, dtf, A, cstate, win, wout, convw, convb, h0, D, nw, hins,
           yd)
    return (out[:, :seqlen], hlast.reshape(bsz, nheads, hdim, n)), res


def _pmixer_vjp_bwd(cfg, interpret, res, cts):
    from videomamba_tpu.ops.dispatch import (
        ssd_bwd_merged_enabled,
        ssd_fwd_merged_enabled,
        ssd_train_route,
    )
    from videomamba_tpu.ops.pallas.ssd_scan import _decay_chain_grads

    if ssd_train_route() == "mixer":
        # Decomposed backward: projection gradients as XLA matmuls around
        # the mixer-core backward (mega-fused by default). Mirrors what
        # autodiff produces on the mixer-level model route — the measured
        # training winner once the core kernels went MXU-merged.
        from videomamba_tpu.ops.pallas.ssd_scan import (
            _mixer_vjp_bwd as _mx_bwd,
        )

        xin, gated, win, wout, mres = res
        dout, dhlast = cts
        dgated = dout @ wout.T
        dwout = jnp.einsum("bli,blo->io", gated, dout).astype(wout.dtype)
        (dzx, ddtp, dA, dcst, dcw, dcb, dh0, dD, dnw) = _mx_bwd(
            cfg, interpret, mres, (dgated, dhlast))
        dxin = (dzx @ win.T).astype(xin.dtype)
        dwin = jnp.einsum("bld,ble->de", xin, dzx).astype(win.dtype)
        return (dxin, ddtp, dA, dcst, dwin, dwout, dcw, dcb, dh0, dD, dnw)

    (xin, dtf, A, cstate, win, wout, convw, convb, h0, D, nw, hins,
     yd) = res
    (nheads, hdim, ngroups, n, d_inner, conv_dim, chunk_size,
     norm_eps) = cfg
    dout, dhlast = cts
    bsz, seqlen, d_model = xin.shape
    q = int(chunk_size)
    lp = dtf.shape[1]
    has_cst = cstate is not None
    has_norm = nw is not None

    pad = lp - seqlen
    xf = jnp.pad(xin, ((0, 0), (0, pad), (0, 0))) if pad else xin
    doutf = jnp.pad(dout, ((0, 0), (0, pad), (0, 0))) if pad else dout
    cst = (
        cstate.astype(xin.dtype).swapaxes(1, 2)
        if has_cst
        else jnp.zeros((bsz, convw.shape[0], conv_dim), xin.dtype)
    )
    dhl = dhlast.astype(jnp.float32).reshape(bsz, nheads * hdim, n)
    outs = _ssd_pmixer_bwd_padded(
        xf, dtf, A.astype(jnp.float32), cst, win, wout, convw,
        convb.astype(jnp.float32).reshape(1, conv_dim), yd, hins, doutf,
        dhl, D.astype(jnp.float32),
        (nw.astype(jnp.float32).reshape(1, d_inner) if has_norm else None),
        nheads=nheads, hdim=hdim, ngroups=ngroups, d_state=n,
        d_inner=d_inner, conv_dim=conv_dim, chunk_size=q,
        norm_eps=float(norm_eps), interpret=interpret,
        merged=ssd_bwd_merged_enabled(),
        # The merged FORWARD emits the hins residual transposed; both rules
        # read the same trace-time knob (kernel_knob_fingerprint guards
        # long-lived caches against env flips).
        hins_transposed=(ngroups == 1 and ssd_fwd_merged_enabled()),
    )
    (dxf, ds_col, ds_row, ddtp_col, ddtp_row, dh0f, dwin_b, dwout_b,
     dcw_b, dcb_b, ddsk_b, dcst_b) = outs[:12]
    dnw = (
        jnp.sum(outs[12], axis=(0, 1)).astype(nw.dtype) if has_norm
        else None
    )

    ddtp, dA = _decay_chain_grads(ds_col, ds_row, ddtp_col, ddtp_row,
                                  A, dtf, q)
    dxin = dxf[:, :seqlen]
    ddtp = ddtp[:, :seqlen].astype(dtf.dtype)
    dwin = jnp.sum(dwin_b, axis=0).astype(win.dtype)
    dwout = jnp.sum(dwout_b, axis=0).astype(wout.dtype)
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
    return (dxin, ddtp, dA.astype(A.dtype), dcst, dwin, dwout, dcw, dcb,
            dh0, dD, dnw)


_pmixer_core.defvjp(_pmixer_vjp_fwd, _pmixer_vjp_bwd)


def ssd_projected_mixer(
    hidden: Array,             # (B, L, d_model) normed block input
    A: Array,                  # (H,) or A_log-derived f32 negative
    in_proj: Array,            # (d_model, DPJ)
    out_proj: Array,           # (DI, d_model)
    conv_weight: Array,        # (W, CD)
    conv_bias: Optional[Array],
    D: Array,                  # (H,)
    dt_bias: Optional[Array],
    initial_state: Optional[Array] = None,   # (B, H, P, N)
    conv_state: Optional[Array] = None,      # (B, CD, W)
    norm_weight: Optional[Array] = None,
    norm_eps: float = 1e-5,
    chunk_size: int = 128,
    nheads: int = 0,
    hdim: int = 0,
    ngroups: int = 1,
    d_state: int = 0,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """The Mamba-2 mixer INCLUDING both projections in one kernel.

    In: the normed hidden states; out: ``(out_proj output (B, L, d_model),
    h_last f32 (B, H, P, N))``. The dt path (softplus + its slice of the
    in_proj) runs outside as regular ops so its gradient stitches itself
    via autodiff (the kernel's dWin dt-columns are zero).
    """
    from videomamba_tpu.ops.dispatch import interpret_mode
    from videomamba_tpu.ops.ssd import _prepare_dt

    if interpret_mode():
        interpret = True
    d_inner = nheads * hdim
    conv_dim = d_inner + 2 * ngroups * d_state
    dt_raw = hidden @ in_proj[:, d_inner + conv_dim:]
    dt_p = _prepare_dt(dt_raw, dt_bias, True)
    cb = (
        conv_bias if conv_bias is not None
        else jnp.zeros((conv_dim,), jnp.float32)
    )
    cfg = (int(nheads), int(hdim), int(ngroups), int(d_state),
           int(d_inner), int(conv_dim), int(chunk_size), float(norm_eps))
    return _pmixer_core(
        hidden, dt_p, A.astype(jnp.float32), conv_state, in_proj, out_proj,
        conv_weight, cb, initial_state, D.astype(jnp.float32), norm_weight,
        cfg, bool(interpret),
    )
