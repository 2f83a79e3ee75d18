"""Whole-Block fused backward kernel: the training twin of block_fused.

One pallas_call computes every gradient of the full prenorm Block span

    res_out = hidden + residual            (saved by the forward)
    normed  = rmsnorm/ln(res_out) * nw + nb
    xz      = normed @ Win;  x, z = split
    y       = mixer_core(x, z)             (conv + proj + scan + gate)
    out     = y @ Wout

given cotangents (g_out, g_resout, g_hlast). Extends ops/pallas/mixer_bwd
with the three outer chains:

  * out_proj:  g_y = g_out @ WoutT (per block, MXU); dWout accumulates
    against y reconstructed inside the reverse scan walk (pre_full *
    silu(z)) — no forward y is stored.
  * in_proj:   dxz = [dx | dz] -> dnormed = dxz @ WinT; dWin += normedT@dxz.
  * add-norm:  rms/ln row backward in-kernel; d(res_out) = dnorm-chain +
    g_resout, which the caller fans out to both hidden and residual
    cotangents (the add is gradient-transparent).

The forward saves only (res_out, hckpt) as residuals — res_out is the
residual stream the next layer consumes anyway, and hckpt is the scan's
8-step group-entry states. Everything else is recomputed in VMEM with
numerics identical to block_fused's forward. Covers the reference span
Block.forward + mamba_inner_fn (videomamba.py:87-253,
mamba_simple.py:343-367) with streaming-state gradients on top.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videomamba_tpu.ops.pallas.mixer_fused import PACK

Array = jax.Array

DEFAULT_BLOCK_L = 160  # swept on v5e at Base train shapes: 160 > 128 > 64


def _block_bwd_kernel(
    # inputs — time blocks indexed in REVERSED order
    rout_ref,     # (1, c, E) res_out (saved by forward, f32 policy)
    rprev_ref,    # (1, c, E) previous-time block of res_out
    g_ref,        # (1, c, E) cotangent of out
    gres_ref,     # (1, c, E) cotangent of res_out
    nw_ref,       # (1, E) f32 norm weight
    nb_ref,       # (1, E) f32 norm bias (zeros for rms)
    win_ref,      # (E, 2*Di)
    wout_ref,     # (Di, E)
    cstate_ref,   # (1, W, Di) streaming conv window (raw x inputs)
    convw_ref,    # (W, Di)
    convb_ref,    # (1, Di) f32
    wx_ref,       # (Di, 3*PACK)
    wdt_ref,      # (PACK, Di)
    at_ref,       # (N, Di) f32
    dskip_ref,    # (1, Di) f32
    dtbias_ref,   # (1, Di) f32
    hckpt_ref,    # (1, c/8, N, Di) f32 group-entry states
    ghlast_ref,   # (1, N, Di) f32
    # outputs
    dres_ref,     # (1, c, E) d(res_out): fan out to hidden AND residual
    dnw_ref,      # (1, 1, E) f32 per-batch partial
    dnb_ref,      # (1, 1, E) f32 per-batch partial
    dwin_ref,     # (1, E, 2*Di) f32 per-batch partial
    dwout_ref,    # (1, Di, E) f32 per-batch partial
    dcw_ref,      # (1, W, Di) f32 per-batch partial
    dcb_ref,      # (1, 1, Di) f32 per-batch partial
    dwx_ref,      # (1, Di, 3*PACK) f32 per-batch partial
    dwdt_ref,     # (1, PACK, Di) f32 per-batch partial
    da_ref,       # (1, N, Di) f32 per-batch partial
    ddsk_ref,     # (1, 1, Di) f32
    dbs_ref,      # (1, 1, Di) f32
    dh0_ref,      # (1, N, Di) f32
    dcst_ref,     # (1, W, Di) f32
    # scratch
    s_scr,        # (N, Di) f32 reverse cotangent carry
    carry_scr,    # (8, Di) f32 next-block head rows of dcpre
    cy_scr,       # (c, Di) f32
    delta_scr,    # (c, Di) f32
    z_scr,        # (c, Di) f32
    gy_scr,       # (c, Di) f32
    xdbl_scr,     # (c, 3*PACK) f32
    ddelta_scr,   # (c, Di) f32
    dcy_scr,      # (c, Di) f32
    dz_scr,       # (c, Di) f32
    y_scr,        # (c, Di) f32 reconstructed mixer gate output
    dbc_scr,      # (c, 2*PACK) f32
    da_scr,       # (N, Di) f32
    ddsk_scr,     # (1, Di) f32
    dbs_scr,      # (1, Di) f32
    dcb_scr,      # (1, Di) f32
    dcw_scr,      # (8, Di) f32
    dwx_scr,      # (Di, 3*PACK) f32
    dwdt_scr,     # (PACK, Di) f32
    dnw_scr,      # (1, E) f32
    dnb_scr,      # (1, E) f32
    dwin_scr,     # (E, 2*Di) f32
    dwout_scr,    # (Di, E) f32
    *,
    block_l: int,
    width: int,
    n_state: int,
    seqlen: int,
    norm_rms: bool,
    eps: float,
    highest: bool,
):
    l_idx = pl.program_id(2)
    kb = pl.num_programs(2)
    n = n_state
    group = 8
    num_groups = block_l // group
    time_blk = kb - 1 - l_idx
    d_inner = win_ref.shape[1] // 2
    e_model = win_ref.shape[0]

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
        dnw_scr[:] = jnp.zeros_like(dnw_scr)
        dnb_scr[:] = jnp.zeros_like(dnb_scr)
        dwin_scr[:] = jnp.zeros_like(dwin_scr)
        dwout_scr[:] = jnp.zeros_like(dwout_scr)

    precision = jax.lax.Precision.HIGHEST if highest else None

    # ---- recompute: norm -> in_proj (this block), numerics = block_fused.
    def norm_rows(rows):
        rows = rows.astype(jnp.float32)
        if norm_rms:
            var = jnp.mean(jnp.square(rows), axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(var + eps)
            nrm = rows * inv
        else:
            mu = jnp.mean(rows, axis=-1, keepdims=True)
            cen = rows - mu
            var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
            inv = jax.lax.rsqrt(var + eps)
            nrm = cen * inv
        return nrm, inv

    r_out = rout_ref[0].astype(jnp.float32)                  # (c, E)
    nrm, inv = norm_rows(r_out)
    normed = nrm * nw_ref[0][None, :] + nb_ref[0][None, :]
    mm0 = normed if highest else normed.astype(win_ref.dtype)
    xz = jax.lax.dot(mm0, win_ref[:].astype(mm0.dtype), precision=precision,
                     preferred_element_type=jnp.float32)     # (c, 2Di)
    x = xz[:, :d_inner]
    z_scr[:] = xz[:, d_inner:]

    # Conv left context: previous block's last W-1 x rows, recomputed from
    # the saved residual stream; the streaming window for time block 0.
    ptail = rprev_ref[0][block_l - (width - 1):, :]
    pnrm, _ = norm_rows(ptail)
    pnormed = pnrm * nw_ref[0][None, :] + nb_ref[0][None, :]
    pmm = pnormed if highest else pnormed.astype(win_ref.dtype)
    pxz = jax.lax.dot(pmm, win_ref[:, :d_inner].astype(pmm.dtype),
                      precision=precision,
                      preferred_element_type=jnp.float32)    # (W-1, Di)
    state_tail = cstate_ref[0][1:, :].astype(jnp.float32)
    left = jnp.where(time_blk == 0, state_tail, pxz)
    ctx = jnp.concatenate([left, x], axis=0)                 # (c+W-1, Di)

    w = convw_ref[:].astype(jnp.float32)
    cy_pre = w[width - 1][None, :] * x
    for k in range(width - 1):
        cy_pre = cy_pre + w[k][None, :] * ctx[k:k + block_l]
    cy_pre = cy_pre + convb_ref[0][None, :]
    sig_c = jax.nn.sigmoid(cy_pre)
    cy = cy_pre * sig_c
    cy_scr[:] = cy

    mm1 = cy if highest else cy.astype(wx_ref.dtype)
    xdbl = jax.lax.dot(mm1, wx_ref[:].astype(mm1.dtype), precision=precision,
                       preferred_element_type=jnp.float32)   # (c, 3*PACK)
    xdbl_scr[:] = xdbl
    dt_in = xdbl[:, :PACK]
    dt_mm = dt_in if highest else dt_in.astype(wdt_ref.dtype)
    delta_raw = jax.lax.dot(dt_mm, wdt_ref[:].astype(dt_mm.dtype),
                            precision=precision,
                            preferred_element_type=jnp.float32)
    delta = delta_raw + dtbias_ref[0][None, :]
    delta = jax.nn.softplus(delta)
    row_ids = lax.broadcasted_iota(jnp.int32, (block_l, 1), 0)
    valid = (time_blk * block_l + row_ids) < seqlen
    delta_scr[:] = jnp.where(valid, delta, 0.0)

    # ---- out_proj backward entry: g_y for the scan walk.
    g_out = g_ref[0]
    gmm = g_out if highest else g_out.astype(wout_ref.dtype)
    gy_scr[:] = jax.lax.dot_general(
        gmm, wout_ref[:].astype(gmm.dtype),
        (((1,), (1,)), ((), ())),                            # (c, Di)
        precision=precision, preferred_element_type=jnp.float32,
    )

    a_t = at_ref[:]
    dskip_row = dskip_ref[0][None, :]
    # 2-D (8N, Di) group layout — see mixer_bwd.py (25% faster than 3-D on
    # v5e, scripts/exp_bwd_walk.py).
    a_rep = jnp.concatenate([a_t] * group, axis=0)

    # ---- reverse scan walk (math identical to mixer_bwd).
    def bwd_body(gi, s):
        gidx = num_groups - 1 - gi
        base = gidx * group
        u_rows = cy_scr[pl.ds(base, group), :]
        d_rows = delta_scr[pl.ds(base, group), :]
        du_rows = d_rows * u_rows
        g_rows = gy_scr[pl.ds(base, group), :]
        zf = z_scr[pl.ds(base, group), :]
        sig = jax.nn.sigmoid(zf)
        g2_rows = g_rows * (zf * sig)
        b8 = xdbl_scr[pl.ds(base, group), PACK:PACK + n]
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
            [b8[k][:, None] for k in range(group)], axis=0)
        c_flat = jnp.concatenate(
            [c8[k][:, None] for k in range(group)], axis=0)
        dA2 = jnp.exp(d_rep * a_rep)
        dub2 = b_flat * du_rep
        dyc2 = c_flat * g2_rep

        h = hckpt_ref[0, gidx].astype(jnp.float32)
        hs = [h]
        for k in range(group):
            blk = slice(k * n, (k + 1) * n)
            h = dA2[blk] * h + dub2[blk]
            hs.append(h)
        hprev2 = jnp.concatenate(hs[:-1], axis=0)
        ht2 = jnp.concatenate(hs[1:], axis=0)

        dhs = [None] * group
        for k in reversed(range(group)):
            blk = slice(k * n, (k + 1) * n)
            dh = dyc2[blk] + s
            dhs[k] = dh
            s = dA2[blk] * dh
        dh2 = jnp.concatenate(dhs, axis=0)

        da_a2 = dh2 * hprev2 * dA2
        da_a_d = da_a2 * d_rep
        acc = da_a_d[0:n]
        for k in range(1, group):
            acc = acc + da_a_d[k * n:(k + 1) * n]
        da_scr[:] += acc
        t1_full = da_a2 * a_rep
        sB_full = dh2 * b_flat
        term1 = jnp.concatenate(
            [jnp.sum(t1_full[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)
        sB8 = jnp.concatenate(
            [jnp.sum(sB_full[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)
        ddelta = term1 + u_rows * sB8
        ddelta_raw8 = ddelta * (1.0 - jnp.exp(-d_rows))
        dbs_scr[:] += jnp.sum(ddelta_raw8, axis=0, keepdims=True)
        ddsk_scr[:] += jnp.sum(g2_rows * u_rows, axis=0, keepdims=True)
        ddelta_scr[pl.ds(base, group), :] = ddelta_raw8
        dcy_scr[pl.ds(base, group), :] = d_rows * sB8 + g2_rows * dskip_row
        dh8 = jnp.stack(dhs, axis=0)
        ht8 = jnp.stack(
            [ht2[k * n:(k + 1) * n] for k in range(group)], axis=0)
        dbc_scr[pl.ds(base, group), :n] = jnp.sum(
            dh8 * du_rows[:, None, :], axis=2
        )
        dbc_scr[pl.ds(base, group), PACK:PACK + n] = jnp.sum(
            ht8 * g2_rows[:, None, :], axis=2
        )
        pre_full2 = ht2 * c_flat
        pre = jnp.concatenate(
            [jnp.sum(pre_full2[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)
        pre_full = pre + u_rows * dskip_row
        silu_z = zf * sig
        y_scr[pl.ds(base, group), :] = pre_full * silu_z
        dz_scr[pl.ds(base, group), :] = (
            g_rows * pre_full * (sig * (1.0 + zf * (1.0 - sig)))
        )
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

    # ---- out_proj weight gradient (y reconstructed by the walk).
    y_blk = y_scr[:]
    # Weight-grad contractions: bf16 MXU passes with f32 accumulation on
    # the non-highest path (fp32 passes cost 8x and dominated the kernel).
    wg = jnp.float32 if highest else wout_ref.dtype
    dwout_scr[:] += jax.lax.dot_general(
        y_blk.astype(wg), g_out.astype(wg),
        (((0,), (0,)), ((), ())),                            # (Di, E)
        preferred_element_type=jnp.float32,
    )
    dwout_ref[0] = dwout_scr[:]

    # ---- projection epilogue (identical math to mixer_bwd).
    ddelta_blk = ddelta_scr[:]
    dd_mm = ddelta_blk if highest else ddelta_blk.astype(wdt_ref.dtype)
    ddt_in = jax.lax.dot_general(
        dd_mm, wdt_ref[:].astype(dd_mm.dtype),
        (((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    zeros_pad = jnp.zeros((block_l, PACK - n), jnp.float32)
    dxdbl = jnp.concatenate(
        [ddt_in,
         dbc_scr[:, :n], zeros_pad,
         dbc_scr[:, PACK:PACK + n], zeros_pad],
        axis=1,
    )
    dx_mm = dxdbl if highest else dxdbl.astype(wx_ref.dtype)
    dcy_proj = jax.lax.dot_general(
        dx_mm, wx_ref[:].astype(dx_mm.dtype),
        (((1,), (1,)), ((), ())),
        precision=precision, preferred_element_type=jnp.float32,
    )
    dcy = dcy_scr[:] + dcy_proj
    dcpre = dcy * (sig_c * (1.0 + cy_pre * (1.0 - sig_c)))

    dwx_scr[:] += jax.lax.dot_general(
        mm1.astype(wg), dxdbl.astype(wg),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwdt_scr[:] += jax.lax.dot_general(
        dt_in.astype(wg), ddelta_blk.astype(wg),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dwx_ref[0] = dwx_scr[:]
    dwdt_ref[0] = dwdt_scr[:]

    dcb_scr[:] += jnp.sum(dcpre, axis=0, keepdims=True)
    dcb_ref[0, 0] = dcb_scr[0]
    for k in range(width):
        dcw_scr[k, :] += jnp.sum(dcpre * ctx[k:k + block_l], axis=0)
    dcw_ref[0] = dcw_scr[:width]

    # dx (conv correlate with reverse carry) -> dxz -> dnormed.
    dcpre_ext = jnp.concatenate([dcpre, carry_scr[:width - 1]], axis=0)
    dx = w[width - 1][None, :] * dcpre
    for m in range(1, width):
        dx = dx + w[width - 1 - m][None, :] * dcpre_ext[m:m + block_l]
    carry_scr[:width - 1] = dcpre[:width - 1]

    dxz = jnp.concatenate([dx, dz_scr[:]], axis=1)           # (c, 2Di) f32
    dxz_mm = dxz if highest else dxz.astype(win_ref.dtype)
    dnormed = jax.lax.dot_general(
        dxz_mm, win_ref[:].astype(dxz_mm.dtype),
        (((1,), (1,)), ((), ())),                            # (c, E)
        precision=precision, preferred_element_type=jnp.float32,
    )
    dwin_scr[:] += jax.lax.dot_general(
        mm0.astype(wg), dxz.astype(wg),
        (((0,), (0,)), ((), ())),                            # (E, 2Di)
        preferred_element_type=jnp.float32,
    )
    dwin_ref[0] = dwin_scr[:]

    # NOTE: the previous-time block's conv left context also depends on this
    # chain (pxz), but its gradient flows through the NEXT grid iteration's
    # dx carry into that block's own dxz/dnormed — except for the W-1 tail
    # rows' in_proj path, which we must add here: the carried dcpre head of
    # the LATER time block contributes to THIS block's x tail rows, and that
    # is already inside dx above. The pxz recompute itself receives no
    # cotangent in this iteration (its rows belong to the previous block,
    # handled when that block is processed). Gradient-complete because every
    # x row's cotangent is routed to exactly one block's dxz.

    # ---- add-norm backward.
    dnw_scr[:] += jnp.sum(dnormed * nrm, axis=0, keepdims=True)
    dnb_scr[:] += jnp.sum(dnormed, axis=0, keepdims=True)
    dnw_ref[0, 0] = dnw_scr[0]
    dnb_ref[0, 0] = dnb_scr[0]
    dnrm = dnormed * nw_ref[0][None, :]
    e_f = float(e_model)
    if norm_rms:
        dot = jnp.sum(dnrm * r_out, axis=-1, keepdims=True)
        dr = dnrm * inv - r_out * (inv ** 3) * (dot / e_f)
    else:
        mu = jnp.mean(r_out, axis=-1, keepdims=True)
        cen = r_out - mu
        dot = jnp.sum(dnrm * cen, axis=-1, keepdims=True)
        dcen = dnrm * inv - cen * (inv ** 3) * (dot / e_f)
        dr = dcen - jnp.mean(dcen, axis=-1, keepdims=True)

    dres_total = dr + gres_ref[0].astype(jnp.float32)
    dres_ref[0] = dres_total.astype(dres_ref.dtype)

    # Conv-state gradient (first time block only).
    @pl.when(time_blk == 0)
    def _():
        dcst_ref[0] = jnp.zeros_like(dcst_ref[0])
        for r in range(width - 1):
            acc = jnp.zeros((d_inner,), jnp.float32)
            for k in range(width):
                t = r - k
                if 0 <= t < block_l:
                    acc = acc + w[k] * dcpre[t]
            dcst_ref[0, r + 1] = acc


@functools.partial(
    jax.jit,
    static_argnames=("norm_rms", "eps", "highest", "block_l", "interpret"),
)
def block_bwd_pallas(
    res_out: Array,    # (B, L, E) saved forward residual stream (f32 policy)
    norm_w: Array,     # (E,)
    norm_b: Optional[Array],
    win: Array,        # (E, 2*Di)
    wout: Array,       # (Di, E)
    conv_w: Array,     # (W, Di)
    conv_b: Array,     # (Di,)
    wx_pack: Array,    # (Di, 3*PACK)
    wdt_pack: Array,   # (PACK, Di)
    A: Array,          # (Di, N) f32 (already -exp(A_log))
    D: Array,          # (Di,) f32
    dt_bias: Array,    # (Di,) f32
    conv_state: Array, # (B, Di, W)
    hckpt: Array,      # (B, lpad/8, N, Di) f32
    g_out: Array,      # (B, L, E)
    g_resout: Array,   # (B, L, E)
    g_hlast: Array,    # (B, Di, N)
    norm_rms: bool = True,
    eps: float = 1e-5,
    highest: bool = False,
    block_l: int = DEFAULT_BLOCK_L,
    interpret: bool = False,
):
    """Whole-Block fused backward.

    Returns (dres_out, dnorm_w, dnorm_b, dwin, dwout, dconv_w, dconv_b,
    dwx_pack, dwdt_pack, ddt_bias, dA, dD, dh0, dconv_state). The caller
    fans dres_out to both the hidden and residual cotangents (the forward's
    add is gradient-transparent) and unpacks the packed weight grads.
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    bsz, seqlen, e = res_out.shape
    d_inner = win.shape[1] // 2
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
        res_out = jnp.pad(res_out, ((0, 0), (0, pad), (0, 0)))
        g_out = jnp.pad(g_out, ((0, 0), (0, pad), (0, 0)))
        g_resout = jnp.pad(g_resout, ((0, 0), (0, pad), (0, 0)))

    a_t = A.T.astype(jnp.float32)
    dskip = D.astype(jnp.float32)[None, :]
    dtb = dt_bias.astype(jnp.float32)[None, :]
    convb = conv_b.astype(jnp.float32)[None, :]
    nw = norm_w.astype(jnp.float32)[None, :]
    nb = (norm_b if norm_b is not None else jnp.zeros((e,), jnp.float32)
          ).astype(jnp.float32)[None, :]
    cstate_wd = conv_state.swapaxes(1, 2)
    ghl = g_hlast.astype(jnp.float32).swapaxes(1, 2)

    kb = lpad // block_l
    groups_per_block = block_l // 8
    grid = (bsz, 1, kb)
    rev = lambda l: kb - 1 - l  # noqa: E731

    kernel = functools.partial(
        _block_bwd_kernel, block_l=block_l, width=width, n_state=n,
        seqlen=seqlen, norm_rms=norm_rms, eps=eps, highest=highest,
    )

    full_rev = lambda b, j, l: (b, rev(l), 0)  # noqa: E731
    prev_rev = lambda b, j, l: (b, jnp.maximum(rev(l) - 1, 0), 0)  # noqa: E731
    fixed = lambda b, j, l: (0, 0)  # noqa: E731
    perb = lambda b, j, l: (b, 0, 0)  # noqa: E731

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, e), full_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, e), prev_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, e), full_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, e), full_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 2 * d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_inner, e), fixed, memory_space=pltpu.VMEM),
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
            pl.BlockSpec((1, block_l, e), full_rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, 2 * d_inner), perb, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner, e), perb, memory_space=pltpu.VMEM),
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
            jax.ShapeDtypeStruct((bsz, lpad, e), res_out.dtype),
            jax.ShapeDtypeStruct((bsz, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, e), jnp.float32),
            jax.ShapeDtypeStruct((bsz, e, 2 * d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, d_inner, e), jnp.float32),
            jax.ShapeDtypeStruct((bsz, width, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, d_inner, 3 * PACK), jnp.float32),
            jax.ShapeDtypeStruct((bsz, PACK, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, d_inner), jnp.float32),
            jax.ShapeDtypeStruct((bsz, width, d_inner), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d_inner), jnp.float32),             # s
            pltpu.VMEM((8, d_inner), jnp.float32),             # dcpre carry
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # cy
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # delta
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # z
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # g_y
            pltpu.VMEM((block_l, 3 * PACK), jnp.float32),      # xdbl
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # ddelta
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # dcy
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # dz
            pltpu.VMEM((block_l, d_inner), jnp.float32),       # y
            pltpu.VMEM((block_l, 2 * PACK), jnp.float32),      # dB|dC
            pltpu.VMEM((n, d_inner), jnp.float32),             # dA acc
            pltpu.VMEM((1, d_inner), jnp.float32),             # dD acc
            pltpu.VMEM((1, d_inner), jnp.float32),             # dbias acc
            pltpu.VMEM((1, d_inner), jnp.float32),             # dcb acc
            pltpu.VMEM((8, d_inner), jnp.float32),             # dcw acc
            pltpu.VMEM((d_inner, 3 * PACK), jnp.float32),      # dwx acc
            pltpu.VMEM((PACK, d_inner), jnp.float32),          # dwdt acc
            pltpu.VMEM((1, e), jnp.float32),                   # dnw acc
            pltpu.VMEM((1, e), jnp.float32),                   # dnb acc
            pltpu.VMEM((e, 2 * d_inner), jnp.float32),         # dwin acc
            pltpu.VMEM((d_inner, e), jnp.float32),             # dwout acc
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=(26 * bsz * lpad * n * d_inner
                   + 2 * 4 * bsz * lpad * e * 2 * d_inner
                   + 2 * 4 * bsz * lpad * d_inner * 3 * PACK),
            bytes_accessed=(bsz * lpad * e * 4 * 4
                            + bsz * lpad * n * d_inner * 4),
            transcendentals=3 * bsz * lpad * n * d_inner,
        ),
    )(res_out, res_out, g_out, g_resout, nw, nb, win, wout, cstate_wd,
      conv_w, convb, wx_pack, wdt_pack, a_t, dskip, dtb, hckpt, ghl)

    (dres_p, dnw_p, dnb_p, dwin_p, dwout_p, dcw_p, dcb_p, dwx_p, dwdt_p,
     da_p, ddsk_p, dbs_p, dh0_p, dcst_p) = outs

    dres = dres_p[:, :seqlen]
    dnw = jnp.sum(dnw_p, axis=(0, 1))
    dnb = jnp.sum(dnb_p, axis=(0, 1))
    dwin = jnp.sum(dwin_p, axis=0)
    dwout = jnp.sum(dwout_p, axis=0)
    dconv_w = jnp.sum(dcw_p, axis=0)
    dconv_b = jnp.sum(dcb_p, axis=(0, 1))
    dwx_pack_g = jnp.sum(dwx_p, axis=0)
    dwdt_pack_g = jnp.sum(dwdt_p, axis=0)
    dA = jnp.sum(da_p, axis=0).T
    dD = jnp.sum(ddsk_p, axis=(0, 1))
    dbias = jnp.sum(dbs_p, axis=(0, 1))
    dh0 = dh0_p.swapaxes(1, 2)
    dconv_state = dcst_p.swapaxes(1, 2)
    return (dres, dnw, dnb, dwin, dwout, dconv_w, dconv_b, dwx_pack_g,
            dwdt_pack_g, dbias, dA, dD, dh0, dconv_state)
