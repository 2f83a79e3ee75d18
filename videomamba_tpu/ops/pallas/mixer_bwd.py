"""Fully-fused Mamba-mixer backward kernel.

One pallas_call computes every gradient of the fused mixer core
(conv + x_proj + dt_proj + selective scan + D-skip + SiLU(z) gate — the
span covered by ``ops/pallas/mixer_fused``), replacing the composite
backward (XLA recompute of conv/projections chained to ``scan_bwd_pallas``
plus five XLA gradient einsums) that round-tripped six (B, L, d_inner)
fp32 tensors through HBM per layer.

Reference semantics covered: the backward of mamba-ssm's fused
``mamba_inner_fn`` between the in/out projections
(/root/reference/models/videomamba/mamba_simple.py:343-367), here with
streaming state (h0 / conv_state) gradients as well.

Structure (grid = (B, 1, L/block_l), time blocks walked in REVERSE):

  recompute phase (per block, VMEM only):
      cy_pre = causal_depthwise_conv(x)          [VPU, prev-block trick]
      cy     = silu(cy_pre)
      xdbl   = cy @ Wx_pack                      [MXU]
      draw   = xdbl[:, :PACK] @ Wdt_pack         [MXU]
  reverse scan phase: identical math to ops/pallas/scan._scan_bwd_kernel
      (8-step groups rebuilt from the forward's group-entry checkpoints;
      only the two 2-op/step chains are serial), but ddelta/du/dB/dC stay
      in VMEM scratch instead of going to HBM.
  projection epilogue (per block, MXU):
      dxdbl  = [ddelta_raw @ WdtT | dB | dC]
      dcy    = du_scan + dxdbl @ WxT
      dcpre  = dcy * silu'(cy_pre)
      dx     = conv_correlate(dcpre)   (next-block rows via reverse carry)
      dWx   += cyT @ dxdbl;   dWdt += xdbl[:, :PACK]T @ ddelta_raw
      dconv_w/b, dconv_state accumulated likewise.

All matmul work rides the MXU slack left by the serial scan chains, so
the epilogue is nearly free; HBM traffic per layer drops from ~11 fp32
(B, L, d_inner) round trips to reads of x/z/g/hckpt and writes of dx/dz.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

PACK = 128  # lane-aligned packed-column group width (matches mixer_fused)
DEFAULT_BLOCK_L = 160  # swept on v5e at Base train shapes: 160 ≈ 80 > 64 > 40


def mixer_bwd_supported(d_inner: int, dt_rank: int, d_state: int) -> bool:
    """Same support envelope as the fused forward (full-width d_inner)."""
    return (
        d_inner % 128 == 0
        and 0 < dt_rank <= PACK
        and 0 < d_state <= PACK
        and d_state % 8 == 0
    )


def _mixer_bwd_kernel(
    # inputs — time blocks indexed in REVERSED order
    x_ref,        # (1, c, Di) conv raw input (in_proj x-half)
    xprev_ref,    # (1, c, Di) previous-time block of x
    z_ref,        # (1, c, Di) gate input
    g_ref,        # (1, c, Di) cotangent of the mixer output y
    cstate_ref,   # (1, W, Di) streaming conv window (raw inputs)
    convw_ref,    # (W, Di)
    convb_ref,    # (1, Di) f32
    wx_ref,       # (Di, 3*PACK) packed x_proj
    wdt_ref,      # (PACK, Di) packed dt_proj
    at_ref,       # (N, Di) f32
    dskip_ref,    # (1, Di) f32
    dtbias_ref,   # (1, Di) f32
    hckpt_ref,    # (1, c/8, N, Di) f32 group-entry states (fwd checkpoints)
    ghlast_ref,   # (1, N, Di) f32 cotangent of h_last
    # outputs
    dx_ref,       # (1, c, Di)
    dz_ref,       # (1, c, Di)
    dcw_ref,      # (1, W, Di) f32 per-batch partial
    dcb_ref,      # (1, 1, Di) f32 per-batch partial
    dwx_ref,      # (1, Di, 3*PACK) f32 per-batch partial
    dwdt_ref,     # (1, PACK, Di) f32 per-batch partial
    da_ref,       # (1, N, Di) f32 per-batch partial
    ddsk_ref,     # (1, 1, Di) f32 per-batch partial
    dbs_ref,      # (1, 1, Di) f32 per-batch partial
    dh0_ref,      # (1, N, Di) f32
    dcst_ref,     # (1, W, Di) f32 conv-state gradient
    # scratch
    s_scr,        # (N, Di) f32 reverse cotangent carry
    carry_scr,    # (8, Di) f32 next-block head rows of dcpre (W-1 used)
    cy_scr,       # (c, Di) f32 recomputed conv output
    delta_scr,    # (c, Di) f32 recomputed (masked, post-softplus) delta
    xdbl_scr,     # (c, 3*PACK) f32 recomputed projections
    ddelta_scr,   # (c, Di) f32
    dcy_scr,      # (c, Di) f32 (du_scan accumulates here)
    dbc_scr,      # (c, 2*PACK) f32 time-major dB | dC
    da_scr,       # (N, Di) f32
    ddsk_scr,     # (1, Di) f32
    dbs_scr,      # (1, Di) f32
    dcb_scr,      # (1, Di) f32
    dcw_scr,      # (8, Di) f32 (W rows used)
    dwx_scr,      # (Di, 3*PACK) f32
    dwdt_scr,     # (PACK, Di) f32
    *,
    block_l: int,
    width: int,
    n_state: int,
    seqlen: int,
    highest: bool,
    softplus: bool,
):
    l_idx = pl.program_id(2)
    kb = pl.num_programs(2)
    n = n_state
    # 8-step groups match the forward's checkpoint spacing; 16-wide groups
    # measured slower on v5e (82.0 vs 76.8 ms for the 24-layer stack).
    group = 8
    ckpt_stride = 1
    num_groups = block_l // group
    time_blk = kb - 1 - l_idx  # actual time-block index

    @pl.when(l_idx == 0)
    def _():
        s_scr[:] = ghlast_ref[0]
        carry_scr[:] = jnp.zeros_like(carry_scr)
        da_scr[:] = jnp.zeros_like(da_scr)
        ddsk_scr[:] = jnp.zeros_like(ddsk_scr)
        dbs_scr[:] = jnp.zeros_like(dbs_scr)
        dcb_scr[:] = jnp.zeros_like(dcb_scr)
        dcw_scr[:] = jnp.zeros_like(dcw_scr)
        dwx_scr[:] = jnp.zeros_like(dwx_scr)
        dwdt_scr[:] = jnp.zeros_like(dwdt_scr)

    # ---- recompute phase: conv + SiLU + projections (matches mixer_fused).
    x = x_ref[0].astype(jnp.float32)                       # (c, Di)
    prev_tail = xprev_ref[0][block_l - (width - 1):, :].astype(jnp.float32)
    state_tail = cstate_ref[0][1:, :].astype(jnp.float32)  # (W-1, Di)
    left = jnp.where(time_blk == 0, state_tail, prev_tail)
    ctx = jnp.concatenate([left, x], axis=0)               # (c+W-1, Di)
    w = convw_ref[:].astype(jnp.float32)
    cy_pre = w[width - 1][None, :] * x
    for k in range(width - 1):
        cy_pre = cy_pre + w[k][None, :] * ctx[k:k + block_l]
    cy_pre = cy_pre + convb_ref[0][None, :]
    sig_c = jax.nn.sigmoid(cy_pre)
    cy = cy_pre * sig_c                                    # conv_out f32
    cy_scr[:] = cy

    precision = jax.lax.Precision.HIGHEST if highest else None
    mm_in = cy if highest else cy.astype(wx_ref.dtype)
    xdbl = jax.lax.dot(mm_in, wx_ref[:].astype(mm_in.dtype),
                       precision=precision,
                       preferred_element_type=jnp.float32)  # (c, 3*PACK)
    xdbl_scr[:] = xdbl
    dt_in = xdbl[:, :PACK]
    dt_mm = dt_in if highest else dt_in.astype(wdt_ref.dtype)
    delta_raw = jax.lax.dot(dt_mm, wdt_ref[:].astype(dt_mm.dtype),
                            precision=precision,
                            preferred_element_type=jnp.float32)  # (c, Di)
    delta = delta_raw + dtbias_ref[0][None, :]
    if softplus:
        delta = jax.nn.softplus(delta)
    row_ids = lax.broadcasted_iota(jnp.int32, (block_l, 1), 0)
    valid = (time_blk * block_l + row_ids) < seqlen        # (c, 1)
    delta_scr[:] = jnp.where(valid, delta, 0.0)            # mask pad rows

    a_t = at_ref[:]                                        # (N, Di)
    dskip_row = dskip_ref[0][None, :]
    # 2-D (8N, Di) group layout (round-3): the batched gradient terms as
    # flat 2-D tensors with static N-row block slices per step. Measured
    # 25% faster than the (8, N, Di) 3-D structure on v5e (Mosaic relayout
    # cost of 3-D broadcasts/reductions; scripts/exp_bwd_walk.py).
    a_rep = jnp.concatenate([a_t] * group, axis=0)         # (8N, Di)

    # ---- reverse scan phase (math identical to scan._scan_bwd_kernel).
    def bwd_body(gi, s):
        gidx = num_groups - 1 - gi
        base = gidx * group
        u_rows = cy_scr[pl.ds(base, group), :]
        d_rows = delta_scr[pl.ds(base, group), :]
        du_rows = d_rows * u_rows
        g_rows = g_ref[0, pl.ds(base, group), :].astype(jnp.float32)
        zf = z_ref[0, pl.ds(base, group), :].astype(jnp.float32)
        sig = jax.nn.sigmoid(zf)
        g2_rows = g_rows * (zf * sig)
        b8 = xdbl_scr[pl.ds(base, group), PACK:PACK + n]   # (8, N)
        c8 = xdbl_scr[pl.ds(base, group), 2 * PACK:2 * PACK + n]

        di = d_rows.shape[1]
        d_rep = jnp.concatenate(
            [jnp.broadcast_to(d_rows[k:k + 1], (n, di)) for k in range(group)],
            axis=0)
        du_rep = jnp.concatenate(
            [jnp.broadcast_to(du_rows[k:k + 1], (n, di))
             for k in range(group)], axis=0)
        g2_rep = jnp.concatenate(
            [jnp.broadcast_to(g2_rows[k:k + 1], (n, di))
             for k in range(group)], axis=0)
        b_flat = jnp.concatenate(
            [b8[k][:, None] for k in range(group)], axis=0)  # (8N, 1)
        c_flat = jnp.concatenate(
            [c8[k][:, None] for k in range(group)], axis=0)
        dA2 = jnp.exp(d_rep * a_rep)                         # (8N, Di)
        dub2 = b_flat * du_rep
        dyc2 = c_flat * g2_rep

        # Serial chain 1: rebuild pre-update states from the group entry.
        h = hckpt_ref[0, gidx * ckpt_stride].astype(jnp.float32)  # (N, Di)
        hs = [h]
        for k in range(group):
            blk = slice(k * n, (k + 1) * n)
            h = dA2[blk] * h + dub2[blk]
            hs.append(h)
        hprev2 = jnp.concatenate(hs[:-1], axis=0)            # (8N, Di)
        ht2 = jnp.concatenate(hs[1:], axis=0)

        # Serial chain 2: reverse cotangent carry.
        dhs = [None] * group
        for k in reversed(range(group)):
            blk = slice(k * n, (k + 1) * n)
            dh = dyc2[blk] + s
            dhs[k] = dh
            s = dA2[blk] * dh
        dh2 = jnp.concatenate(dhs, axis=0)

        # Batched gradient terms (2-D; per-k N-block sublane reductions).
        da_a2 = dh2 * hprev2 * dA2                           # (8N, Di)
        da_a_d = da_a2 * d_rep
        acc = da_a_d[0:n]
        for k in range(1, group):
            acc = acc + da_a_d[k * n:(k + 1) * n]
        da_scr[:] += acc
        t1_full = da_a2 * a_rep
        sB_full = dh2 * b_flat
        term1 = jnp.concatenate(
            [jnp.sum(t1_full[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)                 # (8, Di)
        sB8 = jnp.concatenate(
            [jnp.sum(sB_full[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)
        ddelta = term1 + u_rows * sB8
        if softplus:
            ddelta_raw8 = ddelta * (1.0 - jnp.exp(-d_rows))
        else:
            g_ids = lax.broadcasted_iota(jnp.int32, (group, 1), 0)
            vrows8 = (time_blk * block_l + base + g_ids) < seqlen
            ddelta_raw8 = jnp.where(vrows8, ddelta, 0.0)
        dbs_scr[:] += jnp.sum(ddelta_raw8, axis=0, keepdims=True)
        ddsk_scr[:] += jnp.sum(g2_rows * u_rows, axis=0, keepdims=True)
        ddelta_scr[pl.ds(base, group), :] = ddelta_raw8
        dcy_scr[pl.ds(base, group), :] = d_rows * sB8 + g2_rows * dskip_row
        # dB/dC need (8, N) lane-reductions over Di — the one place the
        # 3-D form is kept (stacked from the per-step lists).
        dh8 = jnp.stack(dhs, axis=0)
        ht8 = jnp.stack(hs[1:], axis=0)
        dbc_scr[pl.ds(base, group), :n] = jnp.sum(
            dh8 * du_rows[:, None, :], axis=2
        )
        dbc_scr[pl.ds(base, group), PACK:PACK + n] = jnp.sum(
            ht8 * g2_rows[:, None, :], axis=2
        )
        pre_full2 = ht2 * c_flat
        pre = jnp.concatenate(
            [jnp.sum(pre_full2[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)                 # (8, Di)
        pre_full = pre + u_rows * dskip_row
        dz = g_rows * pre_full * (sig * (1.0 + zf * (1.0 - sig)))
        dz_ref[0, pl.ds(base, group), :] = dz.astype(dz_ref.dtype)
        return s

    # Statically unrolled (see block_fused.py: fori_loop costs ~70-80 ns per
    # iteration and walls the scheduler inside an scf.for region).
    s_final = s_scr[:]
    for gi in range(num_groups):
        s_final = bwd_body(gi, s_final)
    s_scr[:] = s_final
    dh0_ref[0] = s_final
    da_ref[0] = da_scr[:]
    ddsk_ref[0, 0] = ddsk_scr[0]
    dbs_ref[0, 0] = dbs_scr[0]

    # ---- projection epilogue (MXU).
    ddelta_blk = ddelta_scr[:]                             # (c, Di) f32
    dd_mm = ddelta_blk if highest else ddelta_blk.astype(wdt_ref.dtype)
    ddt_in = jax.lax.dot_general(
        dd_mm, wdt_ref[:].astype(dd_mm.dtype),
        (((1,), (1,)), ((), ())),                          # (c, PACK)
        precision=precision, preferred_element_type=jnp.float32,
    )
    # dxdbl = [ddt_in | dB | dC] — assembled in lane-aligned PACK groups.
    zeros_pad = jnp.zeros((block_l, PACK - n), jnp.float32)
    dxdbl = jnp.concatenate(
        [ddt_in,
         dbc_scr[:, :n], zeros_pad,
         dbc_scr[:, PACK:PACK + n], zeros_pad],
        axis=1,
    )                                                      # (c, 3*PACK) f32
    dx_mm = dxdbl if highest else dxdbl.astype(wx_ref.dtype)
    dcy_proj = jax.lax.dot_general(
        dx_mm, wx_ref[:].astype(dx_mm.dtype),
        (((1,), (1,)), ((), ())),                          # (c, Di)
        precision=precision, preferred_element_type=jnp.float32,
    )
    dcy = dcy_scr[:] + dcy_proj
    dcpre = dcy * (sig_c * (1.0 + cy_pre * (1.0 - sig_c)))

    # Weight-gradient accumulations (contraction over time rows).
    # Weight-grad contractions: bf16 MXU passes with f32 accumulation on
    # the non-highest path (fp32 passes cost 8x).
    wg = jnp.float32 if highest else wx_ref.dtype
    dwx_scr[:] += jax.lax.dot_general(
        mm_in.astype(wg), dxdbl.astype(wg),
        (((0,), (0,)), ((), ())),                          # (Di, 3*PACK)
        preferred_element_type=jnp.float32,
    )
    dwdt_scr[:] += jax.lax.dot_general(
        dt_in.astype(wg), ddelta_blk.astype(wg),
        (((0,), (0,)), ((), ())),                          # (PACK, Di)
        preferred_element_type=jnp.float32,
    )
    dwx_ref[0] = dwx_scr[:]
    dwdt_ref[0] = dwdt_scr[:]

    # Conv gradients. cy_pre[t] = sum_k w[k] * ctxfull[t+k] + b, where
    # ctxfull = [left(W-1) || x]. dconv taps contract dcpre against ctx.
    dcb_scr[:] += jnp.sum(dcpre, axis=0, keepdims=True)
    dcb_ref[0, 0] = dcb_scr[0]
    for k in range(width):
        dcw_scr[k, :] += jnp.sum(dcpre * ctx[k:k + block_l], axis=0)
    dcw_ref[0] = dcw_scr[:width]

    # dx[s] = sum_m w[W-1-m] * dcpre_ext[s+m]; rows beyond the block come
    # from the next time block's head (processed last iteration — carried).
    dcpre_ext = jnp.concatenate([dcpre, carry_scr[:width - 1]], axis=0)
    dx = w[width - 1][None, :] * dcpre
    for m in range(1, width):
        dx = dx + w[width - 1 - m][None, :] * dcpre_ext[m:m + block_l]
    dx_ref[0] = dx.astype(dx_ref.dtype)
    carry_scr[:width - 1] = dcpre[:width - 1]

    # Conv-state gradient: only the first time block reads the state tail.
    @pl.when(time_blk == 0)
    def _():
        dcst_ref[0] = jnp.zeros_like(dcst_ref[0])
        for r in range(width - 1):  # ctxfull rows 0..W-2 = cstate rows 1..W-1
            acc = jnp.zeros((dcpre.shape[1],), jnp.float32)
            for k in range(width):
                t = r - k
                if 0 <= t < block_l:
                    acc = acc + w[k] * dcpre[t]
            dcst_ref[0, r + 1] = acc


@functools.partial(
    jax.jit,
    static_argnames=("softplus", "highest", "block_l", "interpret"),
)
def mixer_bwd_pallas(
    x_in: Array,       # (B, L, Di) in_proj x-half (raw conv input)
    z_in: Array,       # (B, L, Di) gate input
    conv_w: Array,     # (W, Di)
    conv_b: Array,     # (Di,)
    wx_pack: Array,    # (Di, 3*PACK)
    wdt_pack: Array,   # (PACK, Di)
    A: Array,          # (Di, N) f32 (already -exp(A_log))
    D: Array,          # (Di,) f32
    dt_bias: Array,    # (Di,) f32
    conv_state: Array, # (B, Di, W) raw-input window
    hckpt: Array,      # (B, lpad/8, N, Di) f32 forward checkpoints
    g_y: Array,        # (B, L, Di) cotangent of y
    g_hlast: Array,    # (B, Di, N) cotangent of h_last
    softplus: bool = True,
    highest: bool = False,
    block_l: int = DEFAULT_BLOCK_L,
    interpret: bool = False,
):
    """Gradients of the fused mixer core in one pallas_call.

    Returns (dx_in, dz, dconv_w, dconv_b, dwx_pack, dwdt_pack, ddt_bias,
    dA, dD, dh0, dconv_state). Packed-weight gradients come back in packed
    layout; slice out the live columns/rows to unpack (zero pads are
    gradient-transparent).
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    bsz, seqlen, d_inner = x_in.shape
    n = A.shape[1]
    width = conv_w.shape[0]

    lpad = hckpt.shape[1] * 8
    assert lpad >= seqlen, f"hckpt covers {lpad} steps, have {seqlen}"
    block_l = min(((block_l + 7) // 8) * 8, lpad)
    while lpad % block_l:
        block_l -= 8
    if block_l <= width:
        raise ValueError("block_l must exceed the conv width.")
    pad = lpad - seqlen
    if pad:
        x_in = jnp.pad(x_in, ((0, 0), (0, pad), (0, 0)))
        z_in = jnp.pad(z_in, ((0, 0), (0, pad), (0, 0)))
        g_y = jnp.pad(g_y, ((0, 0), (0, pad), (0, 0)))

    a_t = A.T.astype(jnp.float32)
    dskip = D.astype(jnp.float32)[None, :]
    dtb = dt_bias.astype(jnp.float32)[None, :]
    convb = conv_b.astype(jnp.float32)[None, :]
    cstate_wd = conv_state.swapaxes(1, 2)
    ghl = g_hlast.astype(jnp.float32).swapaxes(1, 2)  # (B, N, Di)

    kb = lpad // block_l
    groups_per_block = block_l // 8
    grid = (bsz, 1, kb)
    rev = lambda l: kb - 1 - l  # noqa: E731

    kernel = functools.partial(
        _mixer_bwd_kernel, block_l=block_l, width=width, n_state=n,
        seqlen=seqlen, highest=highest, softplus=softplus,
    )

    full_rev = lambda b, j, l: (b, rev(l), 0)  # noqa: E731
    prev_rev = lambda b, j, l: (b, jnp.maximum(rev(l) - 1, 0), 0)  # noqa: E731
    fixed = lambda b, j, l: (0, 0)  # noqa: E731
    perb = lambda b, j, l: (b, 0, 0)  # noqa: E731

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, d_inner), full_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d_inner), prev_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d_inner), full_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d_inner), full_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_inner, 3 * PACK), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups_per_block, n, d_inner),
                         lambda b, j, l: (b, rev(l), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d_inner), perb, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, d_inner), full_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d_inner), full_rev,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner, 3 * PACK), perb,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PACK, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, d_inner), perb, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lpad, d_inner), x_in.dtype),    # dx
            jax.ShapeDtypeStruct((bsz, lpad, d_inner), z_in.dtype),    # dz
            jax.ShapeDtypeStruct((bsz, width, d_inner), jnp.float32),  # dcw
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),      # dcb
            jax.ShapeDtypeStruct((bsz, d_inner, 3 * PACK), jnp.float32),
            jax.ShapeDtypeStruct((bsz, PACK, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, d_inner), jnp.float32),      # dA
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),      # dD
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),      # dbias
            jax.ShapeDtypeStruct((bsz, n, d_inner), jnp.float32),      # dh0
            jax.ShapeDtypeStruct((bsz, width, d_inner), jnp.float32),  # dcst
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d_inner), jnp.float32),             # s
            pltpu.VMEM((8, d_inner), jnp.float32),             # dcpre carry
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # cy
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # delta
            pltpu.VMEM((block_l, 3 * PACK), jnp.float32),      # xdbl
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # ddelta
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # dcy
            pltpu.VMEM((block_l, 2 * PACK), jnp.float32),      # dB|dC
            pltpu.VMEM((n, d_inner), jnp.float32),             # dA acc
            pltpu.VMEM((1, d_inner), jnp.float32),             # dD acc
            pltpu.VMEM((1, d_inner), jnp.float32),             # dbias acc
            pltpu.VMEM((1, d_inner), jnp.float32),             # dcb acc
            pltpu.VMEM((8, d_inner), jnp.float32),             # dcw acc
            pltpu.VMEM((d_inner, 3 * PACK), jnp.float32),      # dwx acc
            pltpu.VMEM((PACK, d_inner), jnp.float32),          # dwdt acc
        ],
        interpret=interpret,
        # Scratch + double-buffered blocks exceed the 16MB scoped-vmem
        # default at Base shapes (17.7MB); v5e has far more physical VMEM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(26 * bsz * lpad * n * d_inner
                   + 2 * 4 * bsz * lpad * d_inner * 3 * PACK),
            bytes_accessed=(bsz * lpad * d_inner * 2 * 4
                            + bsz * lpad * n * d_inner * 4),
            transcendentals=3 * bsz * lpad * n * d_inner,
        ),
    )(x_in, x_in, z_in, g_y, cstate_wd, conv_w, convb, wx_pack, wdt_pack,
      a_t, dskip, dtb, hckpt, ghl)

    (dx_p, dz_p, dcw_p, dcb_p, dwx_p, dwdt_p, da_p, ddsk_p, dbs_p,
     dh0_p, dcst_p) = outs

    dx = dx_p[:, :seqlen]
    dz = dz_p[:, :seqlen]
    dconv_w = jnp.sum(dcw_p, axis=0)
    dconv_b = jnp.sum(dcb_p, axis=(0, 1))
    dwx_pack_g = jnp.sum(dwx_p, axis=0)
    dwdt_pack_g = jnp.sum(dwdt_p, axis=0)
    dA = jnp.sum(da_p, axis=0).T          # (Di, N)
    dD = jnp.sum(ddsk_p, axis=(0, 1))
    dbias = jnp.sum(dbs_p, axis=(0, 1))
    dh0 = dh0_p.swapaxes(1, 2)            # (B, Di, N)
    dconv_state = dcst_p.swapaxes(1, 2)   # (B, Di, W)
    return (dx, dz, dconv_w, dconv_b, dwx_pack_g, dwdt_pack_g, dbias,
            dA, dD, dh0, dconv_state)
