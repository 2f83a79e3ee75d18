"""Whole-STACK fused decode step: all 24 layers of one token in one kernel.

The reference decodes a token by looping over layers in Python, each layer
dispatching `causal_conv1d_update` + `selective_state_update` CUDA kernels
on tiny (B, d) operands (mamba_simple.py:453-497). The repo's DecodeSession
already collapses that to one `lax.scan` over stacked layer params
(runtime.py), but the honest chain-differenced device time is still ~0.36 ms
per Base token against a ~0.22 ms HBM weight-read floor (the whole stack's
~180 MB of bf16 weights must stream once per token) — the gap is per-layer
fusion-boundary bubbles inside the scanned XLA program.

This kernel makes the grid the LAYER axis: grid step k streams layer k's
weights into VMEM (double-buffered by the Pallas pipeline, so layer k+1's
weight DMA overlaps layer k's compute) while the activations — hidden,
residual — never leave VMEM scratch between layers. Per grid step:

    residual' = hidden + residual                [f32 scratch]
    normed    = rms/ln(residual')
    xz        = normed @ Win_k;  x, z split      [MXU]
    conv      = roll(conv_state_k) ++ x; silu(conv . w)
    x_dbl     = conv @ Wx_k;  dt = x_dbl @ Wdt_k [MXU, lane-packed]
    h_k       = exp(dt*A_k) * h_k + (dt*x) B^T   [single-token state update]
    y         = C h_k + D*x;  y *= silu(z)
    out       = y @ Wout_k -> hidden scratch     [MXU]

It is decode-only (one token, no time axis), forward-only (no backward —
decode is inference), and exact vs. the XLA path modulo dot rounding.

Layouts (K = depth, lane dim last = d_inner/E):
    token (B, E); win (K, E, 2Di); wout (K, Di, E); convw (K, W, Di);
    wx (K, Di, PACK) = x_proj zero-padded to 128 lanes (dt | B | C cols);
    wdt (K, PACK, Di) rows [0:r] real (zero rows kill the B/C columns);
    A (K, N, Di) f32 = -exp(A_log)^T; conv_states (K, B, W, Di);
    ssm_states (K, B, N, Di).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videomamba_tpu.ops.pallas.mixer_fused import PACK

Array = jax.Array


def decode_stack_supported(d_model: int, d_inner: int, dt_rank: int,
                           d_state: int) -> bool:
    """The packed projection needs dt|B|C to fit one 128-lane group, and the
    per-layer weight set (double-buffered) must fit VMEM comfortably."""
    if dt_rank + 2 * d_state > PACK:
        return False
    weight_bytes = (
        d_model * 2 * d_inner + d_inner * d_model + 4 * d_inner
        + d_inner * PACK + PACK * d_inner
    ) * 2 + d_state * d_inner * 4
    return 2 * weight_bytes < 48 * 1024 * 1024


def decode_stack_m2_supported(d_model: int, d_inner: int, nheads: int,
                              ngroups: int, d_state: int) -> bool:
    """SSD decode kernel gate: single B/C group (the published configs), a
    lane-aligned x|B|C split, and VMEM-sized per-layer weights."""
    if ngroups != 1:
        return False
    if d_inner % 128:
        return False
    conv_dim = d_inner + 2 * ngroups * d_state
    d_proj = 2 * d_inner + 2 * ngroups * d_state + nheads
    weight_bytes = (
        d_model * d_proj + d_inner * d_model + 4 * conv_dim
    ) * 2 + d_state * d_inner * 4
    return 2 * weight_bytes < 48 * 1024 * 1024


def _decode_kernel(
    tok_ref,      # (B, E) token embedding (pos already added)
    nw_ref,       # (1, 1, E) norm weight — layer k
    nb_ref,       # (1, 1, E) norm bias (zeros for rms)
    win_ref,      # (1, E, 2Di)
    wout_ref,     # (1, Di, E)
    convw_ref,    # (1, W, Di)
    convb_ref,    # (1, 1, Di) f32
    wx_ref,       # (1, Di, PACK)
    wdt_ref,      # (1, PACK, Di)
    a_ref,        # (1, N, Di) f32
    dskip_ref,    # (1, 1, Di) f32
    dtbias_ref,   # (1, 1, Di) f32
    cst_ref,      # (1, B, W, Di) conv state in — layer k
    hst_ref,      # (1, B, N, Di) ssm state in — layer k
    out_ref,      # out (B, E) f32 — pre-final-norm hidden (last layer)
    resout_ref,   # out (B, E) f32 — carried residual (last layer)
    cout_ref,     # out (1, B, W, Di) new conv state
    hout_ref,     # out (1, B, N, Di) new ssm state
    hid_scr,      # (B, E) f32 scratch — hidden across layers
    res_scr,      # (B, E) f32 scratch — residual across layers
    *,
    num_layers: int,
    width: int,
    n_state: int,
    dt_rank: int,
    norm_rms: bool,
    eps: float,
    precision,
):
    k = pl.program_id(0)
    bsz = tok_ref.shape[0]
    d_inner = wout_ref.shape[1]

    @pl.when(k == 0)
    def _init():
        hid_scr[:] = tok_ref[:].astype(jnp.float32)
        res_scr[:] = jnp.zeros_like(res_scr)

    # ---- add + norm (prenorm): residual' = hidden + residual.
    residual = hid_scr[:] + res_scr[:]
    res_scr[:] = residual
    if norm_rms:
        var = jnp.mean(residual * residual, axis=-1, keepdims=True)
        normed = residual * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(residual, axis=-1, keepdims=True)
        ctr = residual - mu
        var = jnp.mean(ctr * ctr, axis=-1, keepdims=True)
        normed = ctr * jax.lax.rsqrt(var + eps)
    normed = normed * nw_ref[0].astype(jnp.float32) + nb_ref[0].astype(
        jnp.float32)

    # ---- in projection.
    wdtype = win_ref.dtype
    xz = jax.lax.dot(
        normed.astype(wdtype), win_ref[0], precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, 2Di) f32
    x_raw = xz[:, :d_inner]
    z = xz[:, d_inner:]

    # ---- rolling causal conv (window in state layout (B, W, Di)).
    cst = cst_ref[0].astype(jnp.float32)                  # (B, W, Di)
    cw = convw_ref[0].astype(jnp.float32)                 # (W, Di)
    acc = cst[:, 1, :] * cw[0, :] if width > 1 else x_raw * cw[0, :]
    for w in range(1, width):
        tap = x_raw if w == width - 1 else cst[:, w + 1, :]
        acc = acc + tap * cw[w, :]
    xc = acc + convb_ref[0]
    x = xc * jax.nn.sigmoid(xc)                           # (B, Di) f32
    new_cst = jnp.concatenate(
        [cst[:, 1:, :], x_raw[:, None, :]], axis=1
    )
    cout_ref[0] = new_cst.astype(cout_ref.dtype)

    # ---- packed x/dt projections.
    x_dbl = jax.lax.dot(
        x.astype(wdtype), wx_ref[0], precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, PACK): [0:r]=dt_low, [r:r+n]=B, [r+n:r+2n]=C
    dt = jax.lax.dot(
        x_dbl.astype(wdtype), wdt_ref[0], precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, Di) — zero wdt rows >= r kill the B/C columns
    dt = jax.nn.softplus(dt + dtbias_ref[0])

    # ---- single-token state update (the reference's
    # selective_state_update role, mamba_simple.py:476-491).
    a_t = a_ref[0]                                        # (N, Di) f32
    h = hst_ref[0].astype(jnp.float32)                    # (B, N, Di)
    dA = jnp.exp(dt[:, None, :] * a_t[None])              # (B, N, Di)
    b_t = x_dbl[:, dt_rank:dt_rank + n_state]             # (B, N)
    c_t = x_dbl[:, dt_rank + n_state:dt_rank + 2 * n_state]
    h_new = dA * h + (dt * x)[:, None, :] * b_t[:, :, None]
    hout_ref[0] = h_new.astype(hout_ref.dtype)
    y = jnp.sum(c_t[:, :, None] * h_new, axis=1)          # (B, Di)
    y = y + dskip_ref[0] * x
    y = y * (z * jax.nn.sigmoid(z))

    # ---- out projection -> next layer's hidden.
    out = jax.lax.dot(
        y.astype(wdtype), wout_ref[0], precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, E) f32
    hid_scr[:] = out

    @pl.when(k == num_layers - 1)
    def _emit():
        out_ref[:] = out
        resout_ref[:] = res_scr[:]


def decode_stack_pallas(
    token: Array,        # (B, E)
    nw: Array,           # (K, 1, E)
    nb: Optional[Array],  # (K, 1, E) or None
    win: Array,          # (K, E, 2Di)
    wout: Array,         # (K, Di, E)
    conv_w: Array,       # (K, W, Di)
    conv_b: Array,       # (K, 1, Di)
    wx_pack: Array,      # (K, Di, PACK)
    wdt_pack: Array,     # (K, PACK, Di)
    A: Array,            # (K, N, Di) f32
    D: Array,            # (K, 1, Di) f32
    dt_bias: Array,      # (K, 1, Di) f32
    conv_states: Array,  # (K, B, W, Di)
    ssm_states: Array,   # (K, B, N, Di)
    *,
    dt_rank: int,
    norm_rms: bool = True,
    eps: float = 1e-5,
    highest: bool = False,
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """One decode step through the whole layer stack.

    Returns (hidden (B, E) f32 pre-final-norm, residual (B, E) f32,
    new_conv_states, new_ssm_states) — apply the model's final
    `fused_add_norm(prenorm=False)` to (hidden, residual) outside.
    """
    num_layers, _, e = nw.shape
    _, _, two_di = win.shape
    d_inner = two_di // 2
    _, _, width, _ = conv_states.shape
    n_state = A.shape[1]
    bsz = token.shape[0]
    if nb is None:
        nb = jnp.zeros_like(nw)

    fixed3 = lambda k: (k, 0, 0)
    fixed4 = lambda k: (k, 0, 0, 0)
    grid = (num_layers,)
    precision = (jax.lax.Precision.HIGHEST if highest
                 else jax.lax.Precision.DEFAULT)

    kernel = lambda *refs: _decode_kernel(
        *refs, num_layers=num_layers, width=width, n_state=n_state,
        dt_rank=dt_rank, norm_rms=norm_rms, eps=eps, precision=precision,
    )

    out, res_out, new_conv, new_ssm = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bsz, e), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, 2 * d_inner), fixed3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner, e), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, d_inner), fixed3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner, PACK), fixed3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PACK, d_inner), fixed3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_state, d_inner), fixed3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, width, d_inner), fixed4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, n_state, d_inner), fixed4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bsz, e), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, e), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, width, d_inner), fixed4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, n_state, d_inner), fixed4,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, e), jnp.float32),
            jax.ShapeDtypeStruct((bsz, e), jnp.float32),
            jax.ShapeDtypeStruct(conv_states.shape, conv_states.dtype),
            jax.ShapeDtypeStruct(ssm_states.shape, ssm_states.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, e), jnp.float32),
            pltpu.VMEM((bsz, e), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(token, nw, nb, win, wout, conv_w, conv_b, wx_pack, wdt_pack, A, D,
      dt_bias, conv_states, ssm_states)
    return out, res_out, new_conv, new_ssm


# ---------------------------------------------------------------------------
# Mamba-2 (SSD) variant: same whole-stack architecture, scalar-per-head
# decay. The per-head (B, H) quantities are expanded to (B, H*P) lanes with
# one tiny one-hot matmul (an in-kernel (H, P)->(HP,) reshape would force a
# Mosaic relayout; the MXU does it for free).
# ---------------------------------------------------------------------------


def _decode_kernel_m2(
    tok_ref,      # (B, E)
    nw_ref,       # (1, 1, E) block norm weight — layer k
    nb_ref,       # (1, 1, E)
    win_ref,      # (1, E, DPJ)  DPJ = 2Di + 2GN + H
    wout_ref,     # (1, Di, E)
    convw_ref,    # (1, W, CD)   CD = Di + 2GN
    convb_ref,    # (1, 1, CD) f32
    a_ref,        # (1, 1, H) f32 = -exp(A_log)
    dhp_ref,      # (1, 1, Di) f32 — D expanded to head*P lanes
    dtbias_ref,   # (1, 1, H) f32
    gnw_ref,      # (1, 1, Di) gated-RMSNorm weight (ones when rmsnorm off)
    exp_ref,      # (H, Di) f32 one-hot head->lanes expansion (layer-fixed)
    cst_ref,      # (1, B, W, CD) conv state in — layer k
    hst_ref,      # (1, B, N, Di) ssm state in — layer k (lanes = H*P)
    out_ref,      # out (B, E) f32
    resout_ref,   # out (B, E) f32
    cout_ref,     # out (1, B, W, CD)
    hout_ref,     # out (1, B, N, Di)
    hid_scr,      # (B, E) f32
    res_scr,      # (B, E) f32
    *,
    num_layers: int,
    width: int,
    d_inner: int,
    gn: int,
    nheads: int,
    norm_rms: bool,
    rmsnorm_gate: bool,
    eps: float,
    gate_eps: float,
    precision,
):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _init():
        hid_scr[:] = tok_ref[:].astype(jnp.float32)
        res_scr[:] = jnp.zeros_like(res_scr)

    residual = hid_scr[:] + res_scr[:]
    res_scr[:] = residual
    if norm_rms:
        var = jnp.mean(residual * residual, axis=-1, keepdims=True)
        normed = residual * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(residual, axis=-1, keepdims=True)
        ctr = residual - mu
        var = jnp.mean(ctr * ctr, axis=-1, keepdims=True)
        normed = ctr * jax.lax.rsqrt(var + eps)
    normed = normed * nw_ref[0].astype(jnp.float32) + nb_ref[0].astype(
        jnp.float32)

    wdtype = win_ref.dtype
    zxbcdt = jax.lax.dot(
        normed.astype(wdtype), win_ref[0], precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, DPJ) f32
    cd = d_inner + 2 * gn
    z = zxbcdt[:, :d_inner]
    xbc_new = zxbcdt[:, d_inner:d_inner + cd]
    dt_raw = zxbcdt[:, d_inner + cd:d_inner + cd + nheads]  # (B, H)

    # Rolling conv over the [x B C] slab.
    cst = cst_ref[0].astype(jnp.float32)                    # (B, W, CD)
    cw = convw_ref[0].astype(jnp.float32)                   # (W, CD)
    acc = cst[:, 1, :] * cw[0, :] if width > 1 else xbc_new * cw[0, :]
    for w in range(1, width):
        tap = xbc_new if w == width - 1 else cst[:, w + 1, :]
        acc = acc + tap * cw[w, :]
    xc = acc + convb_ref[0]
    xbc = xc * jax.nn.sigmoid(xc)                           # (B, CD) f32
    new_cst = jnp.concatenate([cst[:, 1:, :], xbc_new[:, None, :]], axis=1)
    cout_ref[0] = new_cst.astype(cout_ref.dtype)

    x = xbc[:, :d_inner]                                    # (B, Di)
    b_t = xbc[:, d_inner:d_inner + gn]                      # (B, N) (G=1)
    c_t = xbc[:, d_inner + gn:d_inner + 2 * gn]             # (B, N)

    # Per-head scalars -> head*P lanes via the one-hot expansion matmul.
    dt = jax.nn.softplus(dt_raw + dtbias_ref[0])            # (B, H)
    dA = jnp.exp(dt * a_ref[0])                             # (B, H)
    emat = exp_ref[:]                                       # (H, Di)
    dt_hp = jax.lax.dot(dt, emat, precision=precision,
                        preferred_element_type=jnp.float32)  # (B, Di)
    dA_hp = jax.lax.dot(dA, emat, precision=precision,
                        preferred_element_type=jnp.float32)  # (B, Di)

    h = hst_ref[0].astype(jnp.float32)                      # (B, N, Di)
    h_new = dA_hp[:, None, :] * h + (dt_hp * x)[:, None, :] * b_t[:, :, None]
    hout_ref[0] = h_new.astype(hout_ref.dtype)
    y = jnp.sum(c_t[:, :, None] * h_new, axis=1)            # (B, Di)
    y = y + dhp_ref[0] * x

    gated = y * (z * jax.nn.sigmoid(z))
    if rmsnorm_gate:
        gvar = jnp.mean(gated * gated, axis=-1, keepdims=True)
        gated = gated * jax.lax.rsqrt(gvar + gate_eps)
        gated = gated * gnw_ref[0]

    out = jax.lax.dot(
        gated.astype(wdtype), wout_ref[0], precision=precision,
        preferred_element_type=jnp.float32,
    )  # (B, E) f32
    hid_scr[:] = out

    @pl.when(k == num_layers - 1)
    def _emit():
        out_ref[:] = out
        resout_ref[:] = res_scr[:]


def decode_stack_pallas_m2(
    token: Array,        # (B, E)
    nw: Array,           # (K, 1, E)
    nb: Optional[Array],  # (K, 1, E) or None
    win: Array,          # (K, E, DPJ)
    wout: Array,         # (K, Di, E)
    conv_w: Array,       # (K, W, CD)
    conv_b: Array,       # (K, 1, CD) f32
    A: Array,            # (K, 1, H) f32 = -exp(A_log)
    D_hp: Array,         # (K, 1, Di) f32 — per-head D pre-expanded to lanes
    dt_bias: Array,      # (K, 1, H) f32
    gate_nw: Array,      # (K, 1, Di) gated-norm weight (ones if absent)
    conv_states: Array,  # (K, B, W, CD)
    ssm_states: Array,   # (K, B, N, Di)
    *,
    nheads: int,
    norm_rms: bool = True,
    rmsnorm_gate: bool = True,
    eps: float = 1e-5,
    gate_eps: float = 1e-5,
    highest: bool = False,
    interpret: bool = False,
) -> Tuple[Array, Array, Array, Array]:
    """One SSD decode step through the whole layer stack (see module doc).

    Returns (hidden (B, E) f32 pre-final-norm, residual (B, E) f32,
    new_conv_states, new_ssm_states).
    """
    num_layers, _, e = nw.shape
    _, d_inner, _ = wout.shape
    _, _, width, cd = conv_states.shape
    n_state = ssm_states.shape[2]
    gn = (cd - d_inner) // 2
    bsz = token.shape[0]
    if nb is None:
        nb = jnp.zeros_like(nw)
    hdim = d_inner // nheads
    expand_mat = jnp.repeat(jnp.eye(nheads, dtype=jnp.float32), hdim, axis=1)

    fixed3 = lambda k: (k, 0, 0)
    fixed4 = lambda k: (k, 0, 0, 0)
    precision = (jax.lax.Precision.HIGHEST if highest
                 else jax.lax.Precision.DEFAULT)

    kernel = lambda *refs: _decode_kernel_m2(
        *refs, num_layers=num_layers, width=width, d_inner=d_inner, gn=gn,
        nheads=nheads, norm_rms=norm_rms, rmsnorm_gate=rmsnorm_gate,
        eps=eps, gate_eps=gate_eps, precision=precision,
    )

    out, res_out, new_conv, new_ssm = pl.pallas_call(
        kernel,
        grid=(num_layers,),
        in_specs=[
            pl.BlockSpec((bsz, e), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, e), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e, win.shape[2]), fixed3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner, e), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, cd), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, cd), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nheads), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nheads), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d_inner), fixed3, memory_space=pltpu.VMEM),
            pl.BlockSpec((nheads, d_inner), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, width, cd), fixed4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, n_state, d_inner), fixed4,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bsz, e), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bsz, e), lambda k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, width, cd), fixed4,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bsz, n_state, d_inner), fixed4,
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, e), jnp.float32),
            jax.ShapeDtypeStruct((bsz, e), jnp.float32),
            jax.ShapeDtypeStruct(conv_states.shape, conv_states.dtype),
            jax.ShapeDtypeStruct(ssm_states.shape, ssm_states.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((bsz, e), jnp.float32),
            pltpu.VMEM((bsz, e), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(token, nw, nb, win, wout, conv_w, conv_b, A, D_hp, dt_bias, gate_nw,
      expand_mat, conv_states, ssm_states)
    return out, res_out, new_conv, new_ssm
