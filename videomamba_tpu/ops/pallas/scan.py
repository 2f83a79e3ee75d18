"""Pallas TPU selective-scan kernel — the framework's hot kernel.

Replaces the reference's CUDA ``selective_scan_fn`` / fused ``mamba_inner_fn``
core (/root/reference/models/videomamba/mamba_simple.py:13,343-435) with a
TPU-native design:

* Grid (B, D/d_tile, L/c) with the time axis as the minor (sequential) grid
  dimension; the (N, d_tile) float32 recurrence state lives in VMEM scratch
  and is carried across time blocks — zero HBM traffic for the state.
* Inside a block, the recurrence runs sequentially over c timesteps on the
  VPU. This is *less* total work than a log-depth associative scan
  (5 N·D FLOPs/step vs log2(c) passes) and each step still processes
  N x d_tile = 8K+ lanes, keeping the VPU saturated.
* delta-bias + softplus, the D skip, and the silu(z) gate are fused into the
  same kernel (bandwidth: u/delta/z/B/C read once, y written once).
* B and C are taken time-minor, shape (B, N, L), so their lane dimension is
  the long axis (N=16 would waste 8x lanes as a minor dim).

Numerics match the pure-XLA implementations to ~1e-6 (tested in interpret
mode on CPU and compiled on TPU); state is float32 throughout.

The public entry :func:`scan_chunked_pallas` takes/returns the same
(B, L, D)-layout contract as ``selective_scan_bld`` internals; with
``checkpoints=True`` it also emits the block-entry states that
:func:`scan_bwd_pallas` — the hand-written Pallas backward kernel — consumes
(forward-recompute within blocks from the checkpoints, reverse-time gradient
accumulation, everything VMEM-resident). The hand-derived chunked-XLA
backward in selective_scan.py remains the exact fallback and the gradient
oracle both are tested against.

Activation-memory cost of ``checkpoints=True``: one f32 state per 8-step
group — (B, L/8, N, D) per layer, ~19 MB per batch element at Base shapes
(L=12544, N=16, D=1536), live across all layers during training. That is a
~16-32x denser residual than one-state-per-time-block, bought deliberately:
it is what lets the backward kernel skip its own forward-recompute pass
(train step 117.9 -> 83.5 ms at Base). Memory-constrained configs can drop
to the recompute backward (VIDEOMAMBA_BLOCK_BWD=composite, or
use_fast_path=False), which stores only block-entry states; a finer
checkpoint-stride knob inside the kernel is possible but would need the
backward to re-run group-level forward steps — not worth it until a real
config is HBM-bound here (it would also slow the backward ~proportionally).
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

DEFAULT_BLOCK_L = 256
DEFAULT_BLOCK_D = 512
# Backward tiling (swept on v5e at Base train shapes): short time blocks
# with the full channel width win — fewer sequential grid passes, and the
# per-group (8, N, d) batched ops keep the VPU fed.
DEFAULT_BWD_BLOCK_L = 64
BWD_FULL_WIDTH_MAX_D = 2048


def _pick_block_d(d: int) -> int:
    for cand in (DEFAULT_BLOCK_D, 256, 128):
        if d % cand == 0:
            return cand
    return 0


def pallas_scan_supported(d: int, n: int) -> bool:
    """Shape gate: kernel needs lane-aligned channels and sublane-aligned N."""
    return _pick_block_d(d) > 0 and n % 8 == 0 and n <= 512


def _scan_kernel(
    # refs (order: inputs..., outputs..., scratch...)
    u_ref,        # (1, c, dt) in dtype
    delta_ref,    # (1, c, dt)
    z_ref,        # (1, c, dt)
    b_ref,        # (1, N, c)
    c_ref,        # (1, N, c)
    at_ref,       # (N, dt) f32   A transposed
    dskip_ref,    # (1, dt) f32
    dbias_ref,    # (1, dt) f32
    h0_ref,       # (1, N, dt) f32
    y_ref,        # out (1, c, dt) dtype
    hlast_ref,    # out (1, N, dt) f32
    *rest,
    block_l: int,
    softplus: bool,
    has_z: bool,
    checkpoints: bool = False,
):
    if checkpoints:
        hckpt_ref, h_scratch, delta_scr, du_scr, yacc_scr = rest
    else:
        h_scratch, delta_scr, du_scr, yacc_scr = rest
        hckpt_ref = None
    l_idx = pl.program_id(2)

    @pl.when(l_idx == 0)
    def _():
        h_scratch[:] = h0_ref[0]

    # Vectorized block precompute (all f32), staged in VMEM scratch so the
    # time loop can take pl.ds row views (Mosaic has no array dynamic_slice).
    delta = delta_ref[0].astype(jnp.float32) + dbias_ref[0][None, :]
    if softplus:
        delta = jax.nn.softplus(delta)
    u = u_ref[0].astype(jnp.float32)
    delta_scr[:] = delta
    du_scr[:] = delta * u
    a_t = at_ref[:]                                  # (N, dt)
    b_blk = b_ref[0].astype(jnp.float32)             # (N, c)
    c_blk = c_ref[0].astype(jnp.float32)             # (N, c)
    time_ids = lax.broadcasted_iota(jnp.int32, (1, b_blk.shape[1]), 1)  # (1, c)
    col_ids = lax.broadcasted_iota(jnp.int32, (1, 8), 1)                # (1, g)

    # Mosaic alignment rules shape the loop: dynamic sublane indices must be
    # 8-aligned, and dynamic lane indices are not addressable at all. So the
    # time loop walks 8-row groups (aligned pl.ds loads/stores), statically
    # unrolls the 8 steps inside registers, and pulls the per-step B/C
    # columns out of the lane axis with an exact one-hot masked reduction on
    # the VPU (an MXU matvec would round fp32 operands to bf16).
    group = 8

    def body(g, h):
        base = g * group
        if checkpoints:
            # Group-entry state: the fine-grained residual that lets the
            # backward kernel skip its own forward-recompute pass.
            hckpt_ref[0, g] = h
        d_rows = delta_scr[pl.ds(base, group), :]    # (8, dt)
        du_rows = du_scr[pl.ds(base, group), :]      # (8, dt)
        # Minimal-work serial steps win here (the kernel is VPU-throughput
        # bound, measured): a within-group prefix-product variant that
        # shortens the carried-h chain costs ~2x elementwise work and is
        # slower end to end. exp is batched per group off the serial chain.
        dA8 = jnp.exp(d_rows[:, None, :] * a_t[None, :, :])  # (g, N, dt)
        # Per-step one-hot masked reductions are the fastest extraction
        # measured (MXU matvec variants force lane relayouts and are 3x
        # slower; lane reductions here overlap well with the h chain).
        ys = []
        for k in range(group):
            onehot = (time_ids == base + k).astype(jnp.float32)  # (1, c)
            b_t = jnp.sum(b_blk * onehot, axis=1, keepdims=True)  # (N, 1)
            c_t = jnp.sum(c_blk * onehot, axis=1, keepdims=True)  # (N, 1)
            du_t = du_rows[k:k + 1, :]               # (1, dt) static slice
            h = dA8[k] * h + du_t * b_t              # (N, dt)
            ys.append(jnp.sum(c_t * h, axis=0, keepdims=True))
        yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
        return h

    # Statically unrolled (see block_fused.py: fori_loop costs ~70-80 ns per
    # iteration and walls the scheduler inside an scf.for region).
    h_final = h_scratch[:]
    for g in range(block_l // group):
        h_final = body(g, h_final)
    h_scratch[:] = h_final
    hlast_ref[0] = h_final

    # Fused epilogue: D-skip and silu(z) gate over the whole block, in f32;
    # the only rounding to the output dtype happens here (parity with the
    # reference CUDA kernel's single final cast).
    y = yacc_scr[:] + u * dskip_ref[0][None, :]
    if has_z:
        zf = z_ref[0].astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))
    y_ref[0] = y.astype(y_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "softplus", "has_z", "block_l", "block_d", "interpret", "checkpoints",
    ),
)
def scan_chunked_pallas(
    u: Array,            # (B, L, D)
    delta: Array,        # (B, L, D)
    A: Array,            # (D, N) f32 (negative)
    B: Array,            # (B, L, N)
    C: Array,            # (B, L, N)
    D: Optional[Array],  # (D,) f32 or None
    z: Optional[Array],  # (B, L, D) or None
    delta_bias: Optional[Array],  # (D,) f32 or None
    h0: Array,           # (B, D, N) f32 (contract layout)
    softplus: bool = True,
    has_z: bool = True,
    block_l: int = DEFAULT_BLOCK_L,
    block_d: int = 0,
    interpret: bool = False,
    checkpoints: bool = False,
):
    """Fused selective scan. Returns (y (B, L, D) in u.dtype, h_last (B, D, N) f32).

    With ``checkpoints=True`` additionally returns the group-entry states
    hckpt (B, K, N, D) f32 (K = padded_L / 8, one checkpoint per 8-step
    group) — the residuals the Pallas backward kernel consumes.
    hckpt[:, 0] equals h0.
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    bsz, seqlen, d = u.shape
    n = A.shape[1]
    if block_d == 0:
        block_d = _pick_block_d(d)
    if block_d == 0 or n % 8 != 0:
        raise ValueError(
            f"Pallas scan unsupported for D={d}, N={n}; use the XLA path."
        )
    block_l = min(block_l, max(8, seqlen))
    block_l = ((block_l + 7) // 8) * 8  # group-of-8 time walk needs this

    pad = (-seqlen) % block_l
    lpad = seqlen + pad
    if pad:
        # softplus(-1e30 + bias) == 0 => a=1, b=0: state passthrough. For the
        # no-softplus case delta itself must be zero in padding.
        delta_pad_val = -1e30 if softplus else 0.0
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(
            delta, ((0, 0), (0, pad), (0, 0)), constant_values=delta_pad_val
        )
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
        if z is not None:
            z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)))

    if z is None:
        z = u  # placeholder, kernel compiled with has_z=False ignores values
        has_z = False

    bt = B.swapaxes(1, 2)  # (B, N, L) time-minor
    ct = C.swapaxes(1, 2)
    a_t = A.T.astype(jnp.float32)  # (N, D)
    dskip = (
        D.astype(jnp.float32) if D is not None else jnp.zeros((d,), jnp.float32)
    )[None, :]
    dbias = (
        delta_bias.astype(jnp.float32)
        if delta_bias is not None
        else jnp.zeros((d,), jnp.float32)
    )[None, :]
    h0_nd = h0.astype(jnp.float32).swapaxes(1, 2)  # (B, N, D)

    grid = (bsz, d // block_d, lpad // block_l)
    num_blocks = lpad // block_l

    kernel = functools.partial(
        _scan_kernel, block_l=block_l, softplus=softplus, has_z=has_z,
        checkpoints=checkpoints,
    )

    out_specs = [
        pl.BlockSpec((1, block_l, block_d), lambda b, j, l: (b, l, j),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, block_d), lambda b, j, l: (b, 0, j),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lpad, d), u.dtype),
        jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),
    ]
    if checkpoints:
        groups_per_block = block_l // 8
        out_specs.append(
            pl.BlockSpec((1, groups_per_block, n, block_d),
                         lambda b, j, l: (b, l, 0, j),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, lpad // 8, n, d), jnp.float32)
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, block_d), lambda b, j, l: (b, l, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d), lambda b, j, l: (b, l, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d), lambda b, j, l: (b, l, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_l), lambda b, j, l: (b, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_l), lambda b, j, l: (b, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_d), lambda b, j, l: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((n, block_d), jnp.float32),
            pltpu.VMEM((block_l, block_d), jnp.float32),
            pltpu.VMEM((block_l, block_d), jnp.float32),
            pltpu.VMEM((block_l, block_d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * bsz * lpad * n * d,
            bytes_accessed=bsz * lpad * d * 4 * 4 + bsz * lpad * n * 2 * 4,
            transcendentals=bsz * lpad * n * d,
        ),
    )(u, delta, z, bt, ct, a_t, dskip, dbias, h0_nd)

    if checkpoints:
        y, h_last, hckpt = outs
    else:
        y, h_last = outs
    if pad:
        y = y[:, :seqlen]
    h_last = h_last.swapaxes(1, 2)  # back to (B, D, N)
    if checkpoints:
        return y, h_last, hckpt
    return y, h_last


# ---------------------------------------------------------------- backward

def _scan_bwd_kernel(
    # inputs (blocks indexed in REVERSED time order)
    u_ref,        # (1, c, dt)
    delta_ref,    # (1, c, dt) raw delta
    z_ref,        # (1, c, dt)
    b_ref,        # (1, c, N) time-major
    c_ref,        # (1, c, N) time-major
    g_ref,        # (1, c, dt) cotangent of out
    at_ref,       # (N, dt) f32
    dskip_ref,    # (1, dt) f32
    dbias_ref,    # (1, dt) f32
    hckpt_ref,    # (1, c/8, N, dt) f32 group-entry states
    ghlast_ref,   # (1, N, dt) f32 cotangent of h_last
    # outputs
    du_ref,       # (1, c, dt)
    dd_ref,       # (1, c, dt) d(raw delta)
    dz_ref,       # (1, c, dt)
    db_ref,       # (1, 1, c, N) per-d-tile partial, time-major
    dc_ref,       # (1, 1, c, N) per-d-tile partial, time-major
    da_ref,       # (1, N, dt) per-batch partial
    ddsk_ref,     # (1, 1, dt) per-batch partial (D skip)
    dbs_ref,      # (1, 1, dt) per-batch partial (delta bias)
    dh0_ref,      # (1, N, dt)
    # scratch
    s_scr,        # (N, dt) f32 reverse carry
    da_scr,       # (N, dt) f32 dA accumulator
    ddsk_scr,     # (1, dt) f32
    dbs_scr,      # (1, dt) f32
    *,
    block_l: int,
    softplus: bool,
    has_z: bool,
):
    """Reverse-time gradient block (math in _fused_scan_bwd_impl's docstring).

    One pass over the block, 8-step groups walked back to front. The group's
    entry state comes from the forward kernel's fine-grained checkpoints, so
    the pre-update states h_{t-1} are rebuilt with just the 2-op/step chain
    (no separate recompute pass, no (c, N, dt) state buffer). All per-step
    work except the two serial chains (h forward, s backward) is batched
    over the group: decays, the du*B / dy*C outer products, and every
    gradient contraction run as one (8, N, dt) vector op each. B/C arrive
    time-major so a group's rows are one aligned sublane slice — no per-step
    one-hot lane extraction. Reduced grads (dA, dD, dbias) accumulate in
    VMEM scratch; per-(b, d-tile) partials are summed outside.
    """
    l_idx = pl.program_id(2)
    group = 8
    num_groups = block_l // group

    @pl.when(l_idx == 0)
    def _():
        s_scr[:] = ghlast_ref[0]
        da_scr[:] = jnp.zeros_like(da_scr)
        ddsk_scr[:] = jnp.zeros_like(ddsk_scr)
        dbs_scr[:] = jnp.zeros_like(dbs_scr)

    a_t = at_ref[:]                                  # (N, dt)
    dskip_row = dskip_ref[0][None, :]                # (1, dt)
    dbias_row = dbias_ref[0][None, :]
    n = a_t.shape[0]
    # 2-D (8N, dt) group layout (round-3): 25% faster than the 3-D
    # (8, N, dt) structure on v5e — Mosaic relayouts on 3-D broadcasts and
    # axis-reductions were the cost (scripts/exp_bwd_walk.py). Only the
    # (8, N)-output dB/dC lane reductions stay 3-D.
    a_rep = jnp.concatenate([a_t] * group, axis=0)   # (8N, dt)

    def bwd_body(gi, s):
        gidx = num_groups - 1 - gi
        base = gidx * group
        u_rows = u_ref[0, pl.ds(base, group), :].astype(jnp.float32)
        draw_rows = delta_ref[0, pl.ds(base, group), :].astype(jnp.float32)
        d_rows = draw_rows + dbias_row
        if softplus:
            d_rows = jax.nn.softplus(d_rows)
        du_rows = d_rows * u_rows                    # (8, dt)
        g_rows = g_ref[0, pl.ds(base, group), :].astype(jnp.float32)
        if has_z:
            zf = z_ref[0, pl.ds(base, group), :].astype(jnp.float32)
            sig = jax.nn.sigmoid(zf)
            g2_rows = g_rows * (zf * sig)
        else:
            g2_rows = g_rows
        b8 = b_ref[0, pl.ds(base, group), :].astype(jnp.float32)  # (8, N)
        c8 = c_ref[0, pl.ds(base, group), :].astype(jnp.float32)

        dt_w = d_rows.shape[1]
        d_rep = jnp.concatenate(
            [jnp.broadcast_to(d_rows[k:k + 1], (n, dt_w))
             for k in range(group)], axis=0)
        du_rep = jnp.concatenate(
            [jnp.broadcast_to(du_rows[k:k + 1], (n, dt_w))
             for k in range(group)], axis=0)
        g2_rep = jnp.concatenate(
            [jnp.broadcast_to(g2_rows[k:k + 1], (n, dt_w))
             for k in range(group)], axis=0)
        b_flat = jnp.concatenate(
            [b8[k][:, None] for k in range(group)], axis=0)       # (8N, 1)
        c_flat = jnp.concatenate(
            [c8[k][:, None] for k in range(group)], axis=0)
        dA2 = jnp.exp(d_rep * a_rep)                              # (8N, dt)
        dub2 = b_flat * du_rep
        dyc2 = c_flat * g2_rep

        # Serial chain 1: rebuild pre-update states from the group entry
        # (cast-up: the fused-mixer forward may checkpoint in bf16).
        h = hckpt_ref[0, gidx].astype(jnp.float32)               # (N, dt)
        hs = []
        for k in range(group):
            blk = slice(k * n, (k + 1) * n)
            hs.append(h)
            h = dA2[blk] * h + dub2[blk]
        hprev2 = jnp.concatenate(hs, axis=0)                     # (8N, dt)

        # Serial chain 2: reverse cotangent carry s_t = a_{t+1} dh_{t+1}.
        dhs = [None] * group
        for k in reversed(range(group)):
            blk = slice(k * n, (k + 1) * n)
            dh = dyc2[blk] + s
            dhs[k] = dh
            s = dA2[blk] * dh
        dh2 = jnp.concatenate(dhs, axis=0)                       # (8N, dt)

        # Batched gradient terms (2-D; per-k N-block sublane reductions).
        ht2 = dA2 * hprev2 + dub2
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
             for k in range(group)], axis=0)                     # (8, dt)
        sB8 = jnp.concatenate(
            [jnp.sum(sB_full[k * n:(k + 1) * n], axis=0, keepdims=True)
             for k in range(group)], axis=0)
        ddelta = term1 + u_rows * sB8
        if softplus:
            ddelta_raw = ddelta * (1.0 - jnp.exp(-d_rows))
        else:
            ddelta_raw = ddelta
        dbs_scr[:] += jnp.sum(ddelta_raw, axis=0, keepdims=True)
        ddsk_scr[:] += jnp.sum(g2_rows * u_rows, axis=0, keepdims=True)
        dd_ref[0, pl.ds(base, group), :] = ddelta_raw.astype(dd_ref.dtype)
        du_ref[0, pl.ds(base, group), :] = (
            d_rows * sB8 + g2_rows * dskip_row
        ).astype(du_ref.dtype)
        dh8 = jnp.stack(dhs, axis=0)                             # (8, N, dt)
        ht8 = jnp.stack(
            [ht2[k * n:(k + 1) * n] for k in range(group)], axis=0)
        db_ref[0, 0, pl.ds(base, group), :] = jnp.sum(
            dh8 * du_rows[:, None, :], axis=2
        )
        dc_ref[0, 0, pl.ds(base, group), :] = jnp.sum(
            ht8 * g2_rows[:, None, :], axis=2
        )
        if has_z:
            pre_full2 = ht2 * c_flat
            pre = jnp.concatenate(
                [jnp.sum(pre_full2[k * n:(k + 1) * n], axis=0, keepdims=True)
                 for k in range(group)], axis=0)                 # (8, dt)
            pre_full = pre + u_rows * dskip_row
            dz = g_rows * pre_full * (sig * (1.0 + zf * (1.0 - sig)))
            dz_ref[0, pl.ds(base, group), :] = dz.astype(dz_ref.dtype)
        else:
            dz_ref[0, pl.ds(base, group), :] = jnp.zeros(
                (group, dz_ref.shape[-1]), dz_ref.dtype
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


@functools.partial(
    jax.jit,
    static_argnames=("softplus", "has_z", "block_l", "block_d", "interpret"),
)
def scan_bwd_pallas(
    u: Array,            # (B, L, D)
    delta: Array,        # (B, L, D) raw
    A: Array,            # (D, N) f32
    B: Array,            # (B, L, N)
    C: Array,            # (B, L, N)
    D: Optional[Array],
    z: Optional[Array],
    delta_bias: Optional[Array],
    hckpt: Array,        # (B, K, N, Dm) f32 block-entry states (from fwd)
    g_out: Array,        # (B, L, D) cotangent of out
    g_hlast: Array,      # (B, D, N) f32 cotangent of h_last
    softplus: bool = True,
    has_z: bool = True,
    block_l: int = DEFAULT_BWD_BLOCK_L,
    block_d: int = 0,
    interpret: bool = False,
):
    """Pallas backward of the fused selective scan.

    Returns (du, ddelta, dA, dB, dC, dD, dz, dbias, dh0) with None in the
    slots whose primal was None — same contract as _fused_scan_bwd_impl.
    ``hckpt`` is the forward kernel's group-entry states (B, lpad/8, N, D);
    ``block_l`` only shapes this kernel's tiling (any multiple of 8) and
    need not match the forward's.
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    bsz, seqlen, d = u.shape
    n = A.shape[1]
    if block_d == 0:
        block_d = (
            d if d % 128 == 0 and d <= BWD_FULL_WIDTH_MAX_D
            else _pick_block_d(d)
        )

    # The padded length is fixed by the forward's checkpoints (one per
    # 8-step group); tile it with the largest block_l <= requested that
    # divides it.
    lpad = hckpt.shape[1] * 8
    assert lpad >= seqlen, (
        f"hckpt covers {lpad} steps, sequence has {seqlen}"
    )
    block_l = min(((block_l + 7) // 8) * 8, lpad)
    while lpad % block_l:
        block_l -= 8
    pad = lpad - seqlen
    if pad:
        delta_pad_val = -1e30 if softplus else 0.0
        u = jnp.pad(u, ((0, 0), (0, pad), (0, 0)))
        delta = jnp.pad(
            delta, ((0, 0), (0, pad), (0, 0)), constant_values=delta_pad_val
        )
        B = jnp.pad(B, ((0, 0), (0, pad), (0, 0)))
        C = jnp.pad(C, ((0, 0), (0, pad), (0, 0)))
        g_out = jnp.pad(g_out, ((0, 0), (0, pad), (0, 0)))
        if z is not None:
            z = jnp.pad(z, ((0, 0), (0, pad), (0, 0)))

    had_z = z is not None
    if z is None:
        z = u
        has_z = False

    a_t = A.T.astype(jnp.float32)
    dskip = (
        D.astype(jnp.float32) if D is not None else jnp.zeros((d,), jnp.float32)
    )[None, :]
    dbias = (
        delta_bias.astype(jnp.float32)
        if delta_bias is not None
        else jnp.zeros((d,), jnp.float32)
    )[None, :]
    ghl = g_hlast.astype(jnp.float32).swapaxes(1, 2)  # (B, N, D)

    kb = lpad // block_l
    groups_per_block = block_l // 8
    grid = (bsz, d // block_d, kb)
    rev = lambda l: kb - 1 - l  # noqa: E731

    kernel = functools.partial(
        _scan_bwd_kernel, block_l=block_l, softplus=softplus, has_z=has_z
    )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n),
                         lambda b, j, l: (b, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n),
                         lambda b, j, l: (b, rev(l), 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, block_d), lambda b, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_d), lambda b, j, l: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, groups_per_block, n, block_d),
                         lambda b, j, l: (b, rev(l), 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_d), lambda b, j, l: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, block_d),
                         lambda b, j, l: (b, rev(l), j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_l, n),
                         lambda b, j, l: (b, j, rev(l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_l, n),
                         lambda b, j, l: (b, j, rev(l), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_d), lambda b, j, l: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_d), lambda b, j, l: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_d), lambda b, j, l: (b, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_d), lambda b, j, l: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, lpad, d), jnp.float32),   # du
            jax.ShapeDtypeStruct((bsz, lpad, d), jnp.float32),   # ddelta_raw
            jax.ShapeDtypeStruct((bsz, lpad, d), jnp.float32),   # dz
            jax.ShapeDtypeStruct((bsz, d // block_d, lpad, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, d // block_d, lpad, n), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),      # dA partials
            jax.ShapeDtypeStruct((bsz, 1, d), jnp.float32),      # dD partials
            jax.ShapeDtypeStruct((bsz, 1, d), jnp.float32),      # dbias parts
            jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),      # dh0
        ],
        scratch_shapes=[
            pltpu.VMEM((n, block_d), jnp.float32),            # s
            pltpu.VMEM((n, block_d), jnp.float32),            # dA acc
            pltpu.VMEM((1, block_d), jnp.float32),            # dD acc
            pltpu.VMEM((1, block_d), jnp.float32),            # dbias acc
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=26 * bsz * lpad * n * d,
            bytes_accessed=bsz * lpad * d * 4 * 7 + bsz * lpad * n * 4 * 4,
            transcendentals=2 * bsz * lpad * n * d,
        ),
    )(u, delta, z, B, C, g_out, a_t, dskip, dbias, hckpt, ghl)

    (du_p, dd_p, dz_p, db_p, dc_p, da_p, ddsk_p, dbs_p, dh0_p) = outs

    du = du_p[:, :seqlen].astype(u.dtype)
    ddelta = dd_p[:, :seqlen].astype(delta.dtype)
    dB = jnp.sum(db_p, axis=1)[:, :seqlen].astype(B.dtype)
    dC = jnp.sum(dc_p, axis=1)[:, :seqlen].astype(C.dtype)
    dA = jnp.sum(da_p, axis=0).T.astype(A.dtype)      # (N,D)->(D,N)
    dD = jnp.sum(ddsk_p, axis=(0, 1)).astype(D.dtype) if D is not None else None
    dz = dz_p[:, :seqlen].astype(z.dtype) if had_z else None
    dbias_g = (
        jnp.sum(dbs_p, axis=(0, 1)).astype(delta_bias.dtype)
        if delta_bias is not None
        else None
    )
    dh0 = dh0_p.swapaxes(1, 2)  # (B, D, N) f32
    return (du, ddelta, dA, dB, dC, dD, dz, dbias_g, dh0)
