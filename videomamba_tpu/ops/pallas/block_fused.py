"""Whole-Block fused kernel: add-norm + in_proj + mixer + out_proj.

One pallas_call per layer covering the ENTIRE prenorm block:

    residual' = hidden + residual                     [f32]
    normed    = rmsnorm/ln(residual')
    xz        = normed @ Win;  x, z = split           [MXU, weights resident]
    conv_out  = silu(causal_conv(x))                  [carried-context scratch]
    x_dbl     = conv_out @ Wx_pack; delta = .. @ Wdt  [MXU]
    y         = selective_scan(...) * silu(z) + D-skip
    out       = y @ Wout                              [MXU]

vs. the already-fused mixer this removes the xz / normed / mixer-out HBM
round trips; all five weight matrices stay VMEM-resident across the time
grid (fixed index maps). The causal-conv left context is carried across time
blocks in scratch (the conv input x is computed in-kernel, so the
previous-block-view trick cannot apply; a (W-1, Di) scratch is cheaper
anyway).

Gate: requires the weights + (c, E)/(c, 2Di) temporaries to fit VMEM —
supported for all published VideoMamba sizes (Base is the largest at ~9 MB).
Backward (models/block.py): XLA recompute of norm/projections chained with
scan_bwd_pallas, like the fused mixer.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videomamba_tpu.ops.pallas.mixer_fused import PACK, mixer_fused_supported

Array = jax.Array

DEFAULT_BLOCK_L = 128


def block_fused_supported(d_model: int, d_inner: int, dt_rank: int,
                          d_state: int, weight_bytes_per_el: int = 2) -> bool:
    if not mixer_fused_supported(d_inner, dt_rank, d_state):
        return False
    # VMEM budget: resident weights + (c, Di) f32 temps; cap ~12 MB
    # (v5e has ~16 MB usable; leave room for the in/out block buffers).
    weight_bytes = (
        d_model * 2 * d_inner + d_inner * d_model  # Win, Wout
        + d_inner * 3 * PACK + PACK * d_inner      # packs
    ) * weight_bytes_per_el
    temp_bytes = DEFAULT_BLOCK_L * d_inner * 4 * 5
    # bf16 Base measures ~13.4 MB total and compiles/runs on v5e; fp32 Base
    # (~19 MB) must stay gated out.
    return weight_bytes + temp_bytes < 14 * 1024 * 1024


class BlockForm:
    """Host-side kernel-form decision for the fused Block (pure function of
    geometry + knobs; unit-tested directly in tests/test_block_form.py).

    Forms, fastest-first where they fit:
      static-parity pipelined — compile-time slot indices in the two-stage
        software pipeline; the two pl.when branch bodies stack scoped VMEM
        (~2x), so gated to small working sets (est <= 8 MB: Tiny/Small).
      dynamic-slot pipelined — traced l%2 slot index; fits Base
        (est <= 18 MB window under the 16 MB scoped default, which the
        estimate overshoots by ~2 MB — calibrated, see select_block_form).
      plain — no pipelining; also the training form (checkpoints couple the
        pipeline stages) and the automatic fallback past the 18 MB window.
    """

    __slots__ = ("pipelined", "static_parity", "vmem_raise", "est")

    def __init__(self, pipelined, static_parity, vmem_raise, est):
        self.pipelined = pipelined
        self.static_parity = static_parity
        self.vmem_raise = vmem_raise
        self.est = est

    @property
    def name(self) -> str:
        if not self.pipelined:
            return "plain"
        return "static-parity" if self.static_parity else "dynamic-slot"


def select_block_form(
    *,
    e: int,
    d_inner: int,
    n: int,
    width: int,
    block_l: int,
    weight_itemsize: int,
    hidden_itemsize: int,
    residual_fp32: bool,
    f32_epilogue: bool,
    checkpoints: bool,
    pipeline_env: bool = True,
    static_force: str = "",
    block_l_forced: bool = False,
    verbose: bool = True,
) -> BlockForm:
    """Pick the kernel form for a geometry (pure host logic, no tracing).

    Working-set estimate is calibrated against the compiler's scoped-VMEM
    accounting (Base c=128 measures 17.75 MB there yet fits the 16 MB limit
    in the dynamic-slot form — the estimate runs hot by ~2 MB). Small sets
    get the statically parity-specialized kernel (faster walk addressing,
    ~2x stack); mid-size sets the dynamic-slot kernel; anything beyond what
    Base measures falls back to the plain kernel unless block_l was forced
    (then the pipelined form keeps a raised scoped-VMEM limit so sweeps
    measure the pipelined kernel).
    """
    pipelined = not checkpoints and pipeline_env
    static_parity = False
    vmem_raise = False
    est = 0
    if pipelined:
        wb = weight_itemsize
        hb = hidden_itemsize
        rb = 4 if residual_fp32 else hb
        zb = 4 if f32_epilogue else 2
        weights = (e * 2 * d_inner + d_inner * e + width * d_inner
                   + d_inner * 3 * PACK + PACK * d_inner) * wb
        blocks = 2 * (block_l * e * hb * 2 + block_l * e * rb * 2)
        scratch = (block_l * d_inner * (2 * 4 + 2 * 4 + 2 * zb + 4)
                   + n * d_inner * 4 + (width - 1) * d_inner * 4
                   + 2 * 2 * n * block_l * 4)
        temps = int(2.25 * block_l * d_inner * 4)
        est = weights + blocks + scratch + temps
        if est <= 8 * 1024 * 1024:
            static_parity = True
        elif est > 18 * 1024 * 1024:
            # Beyond the window the dynamic-slot form no longer provably
            # fits the 16 MB scoped default. An EXPLICIT block_l (env knob
            # or non-default kwarg) keeps the pipelined form with a raised
            # limit so a block_l sweep actually measures the pipelined
            # kernel; automatic geometry selection falls back to the plain
            # kernel (and says so — a silent drop would mislead sweeps).
            if block_l_forced:
                vmem_raise = True
            else:
                pipelined = False
                if verbose:
                    print(
                        f"# block_fused: working-set est {est / 2**20:.1f} "
                        f"MB > 18 MB at block_l={block_l}; using the "
                        f"unpipelined kernel (pass an explicit block_l to "
                        f"force the pipelined form)",
                        flush=True,
                    )
        # VIDEOMAMBA_BLOCK_STATIC=1/0 overrides the form choice (A/B knob).
        # Closed door (2026-08-18, v5e): forcing static-parity at Base with
        # the scoped-VMEM limit raised to 100 MB compiles fine but measures
        # 37.0 vs 34.6 ms/chunk (2 runs each) — the doubled branch-body
        # VMEM squeezes the input double-buffering; Base keeps dynamic-slot.
        if static_force == "1" and pipelined:
            static_parity = True
        elif static_force == "0":
            static_parity = False
    return BlockForm(pipelined, static_parity, vmem_raise, est)


def _block_kernel(
    hid_ref,      # (1, c, E) hidden in
    res_ref,      # (1, c, E) residual in (f32 policy upstream)
    nw_ref,       # (1, E) norm weight
    nb_ref,       # (1, E) norm bias (zeros for rms)
    win_ref,      # (E, 2*Di)
    wout_ref,     # (Di, E)
    convw_ref,    # (W, Di)
    convb_ref,    # (1, Di)
    wx_ref,       # (Di, 3*PACK)
    wdt_ref,      # (PACK, Di)
    at_ref,       # (N, Di) f32
    dskip_ref,    # (1, Di) f32
    dtbias_ref,   # (1, Di) f32
    h0_ref,       # (1, N, Di) f32
    cstate_ref,   # (1, W, Di)
    out_ref,      # out (1, c, E) mixer output (next hidden)
    resout_ref,   # out (1, c, E) post-add residual (next residual)
    hlast_ref,    # out (1, N, Di) f32
    *rest,
    block_l: int,
    width: int,
    n_state: int,
    seqlen: int,
    norm_rms: bool,
    eps: float,
    highest: bool,
    checkpoints: bool,
):
    if checkpoints:
        (hckpt_ref, h_scratch, ctx_scr, delta_scr, du_scr, yacc_scr) = rest
    else:
        (h_scratch, ctx_scr, delta_scr, du_scr, yacc_scr) = rest
        hckpt_ref = None
    l_idx = pl.program_id(2)
    n = n_state

    @pl.when(l_idx == 0)
    def _():
        h_scratch[:] = h0_ref[0]
        # Conv left context: last W-1 raw inputs from the streaming window.
        ctx_scr[:] = cstate_ref[0][1:, :].astype(jnp.float32)


    # ---- add-norm (f32 stats).
    res_out = hid_ref[0].astype(jnp.float32) + res_ref[0].astype(jnp.float32)
    resout_ref[0] = res_out.astype(resout_ref.dtype)
    if norm_rms:
        var = jnp.mean(jnp.square(res_out), axis=-1, keepdims=True)
        normed = res_out * jax.lax.rsqrt(var + eps)
    else:
        mu = jnp.mean(res_out, axis=-1, keepdims=True)
        cen = res_out - mu
        var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
        normed = cen * jax.lax.rsqrt(var + eps)
    normed = normed * nw_ref[0][None, :] + nb_ref[0][None, :]

    # ---- in projection.
    precision = jax.lax.Precision.HIGHEST if highest else None
    mm0 = normed if highest else normed.astype(win_ref.dtype)
    xz = jax.lax.dot(mm0, win_ref[:].astype(mm0.dtype), precision=precision,
                     preferred_element_type=jnp.float32)   # (c, 2Di)
    d_inner = win_ref.shape[1] // 2
    x = xz[:, :d_inner]
    z = xz[:, d_inner:]

    # ---- causal conv with carried scratch context.
    ctx = jnp.concatenate([ctx_scr[:], x], axis=0)          # (c+W-1, Di)
    w = convw_ref[:].astype(jnp.float32)
    cy = w[width - 1][None, :] * x
    for k in range(width - 1):
        cy = cy + w[k][None, :] * ctx[k:k + block_l]
    cy = cy + convb_ref[0][None, :]
    cy = cy * jax.nn.sigmoid(cy)
    ctx_scr[:] = x[block_l - (width - 1):, :]               # save for next

    # ---- x/dt projections.
    mm1 = cy if highest else cy.astype(wx_ref.dtype)
    xdbl = jax.lax.dot(mm1, wx_ref[:].astype(mm1.dtype), precision=precision,
                       preferred_element_type=jnp.float32)
    dt_in = xdbl[:, :PACK]
    dt_mm = dt_in if highest else dt_in.astype(wdt_ref.dtype)
    delta_raw = jax.lax.dot(dt_mm, wdt_ref[:].astype(dt_mm.dtype),
                            precision=precision,
                            preferred_element_type=jnp.float32)

    delta = jax.nn.softplus(delta_raw + dtbias_ref[0][None, :])
    row_ids = lax.broadcasted_iota(jnp.int32, (block_l, 1), 0)
    valid = (l_idx * block_l + row_ids) < seqlen
    delta = jnp.where(valid, delta, 0.0)
    delta_scr[:] = delta
    du_scr[:] = delta * cy

    b_blk = xdbl[:, PACK:PACK + n].T
    c_blk = xdbl[:, 2 * PACK:2 * PACK + n].T
    a_t = at_ref[:]
    time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)
    group = 8

    def body(g, h):
        base = g * group
        if checkpoints:
            # Group-entry state: fine-grained residual for the backward.
            hckpt_ref[0, g] = h
        d_rows = delta_scr[pl.ds(base, group), :]
        du_rows = du_scr[pl.ds(base, group), :]
        dA8 = jnp.exp(d_rows[:, None, :] * a_t[None, :, :])
        ys = []
        for k in range(group):
            onehot = (time_ids == base + k).astype(jnp.float32)
            b_t = jnp.sum(b_blk * onehot, axis=1, keepdims=True)
            c_t = jnp.sum(c_blk * onehot, axis=1, keepdims=True)
            h = dA8[k] * h + du_rows[k:k + 1, :] * b_t
            ys.append(jnp.sum(c_t * h, axis=0, keepdims=True))
        yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
        return h

    # Statically unrolled walk: a lax.fori_loop here costs ~70-80 ns per
    # iteration of loop/branch overhead AND walls the scheduler inside an
    # scf.for region; unrolling measured the bare walk 13% faster at Base
    # and 32% at Tiny, and lets the VLIW scheduler overlap neighbouring
    # groups' exp/extraction with the serial chain (scripts/exp_overlap.py).
    h_final = h_scratch[:]
    for g in range(block_l // group):
        h_final = body(g, h_final)
    h_scratch[:] = h_final
    hlast_ref[0] = h_final

    y = yacc_scr[:] + cy * dskip_ref[0][None, :]
    zf = z
    y = y * (zf * jax.nn.sigmoid(zf))

    # ---- out projection.
    mm2 = y if highest else y.astype(wout_ref.dtype)
    out = jax.lax.dot(mm2, wout_ref[:].astype(mm2.dtype), precision=precision,
                      preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _block_kernel_pipelined(
    hid_ref,      # (1, c, E) hidden in — block min(l, nb-1)
    res_ref,      # (1, c, E) residual in
    nw_ref,       # (1, E) norm weight
    nb_ref,       # (1, E) norm bias (zeros for rms)
    win_ref,      # (E, 2*Di)
    wout_ref,     # (Di, E)
    convw_ref,    # (W, Di)
    convb_ref,    # (1, Di)
    wx_ref,       # (Di, 3*PACK)
    wdt_ref,      # (PACK, Di)
    at_ref,       # (N, Di) f32
    dskip_ref,    # (1, Di) f32
    dtbias_ref,   # (1, Di) f32
    h0_ref,       # (1, N, Di) f32
    cstate_ref,   # (1, W, Di)
    out_ref,      # out (1, c, E) mixer output — block max(l-1, 0)
    resout_ref,   # out (1, c, E) post-add residual — block min(l, nb-1)
    hlast_ref,    # out (1, N, Di) f32
    h_scratch,    # (N, Di) f32
    ctx_scr,      # (W-1, Di) f32
    delta2_scr,   # (2, c, Di) f32 — double-buffered
    cy2_scr,      # (2, c, Di) f32 — double-buffered
    z2_scr,       # (2, c, Di) bf16 — double-buffered gate input
    bc2_scr,      # (2, 2N, c) f32 — double-buffered B/C time-major
    yacc_scr,     # (c, Di) f32
    *,
    block_l: int,
    width: int,
    n_state: int,
    seqlen: int,
    num_blocks: int,
    norm_rms: bool,
    eps: float,
    highest: bool,
    static_parity: bool,
):
    """Software-pipelined whole-Block forward (serving path).

    The serial scan walk is the critical path (ROADMAP round-3 walk-floor
    analysis: ~13 us walk vs ~6.6 us MXU per Base time block, back to
    back), but block l's projections do not depend on block l-1's walk.
    This kernel runs over ``num_blocks + 1`` grid steps; step ``l``
    projects block ``l`` (add-norm -> in_proj -> conv -> x/dt proj) into
    double-buffered scratch AND walks block ``l-1`` from the other slot,
    all in ONE unrolled basic block so Mosaic's VLIW scheduler co-issues
    the MXU matmuls with the serial VPU chain (scripts/exp_overlap.py:
    58-76%% of the matmul time hidden at Base, ~100%% at Tiny). Both
    stages run unconditionally — a `pl.when` region boundary would wall
    the scheduler and forfeit the overlap — so step 0 runs a dead walk on
    a zeroed slot (finite: dA=exp(0)=1 keeps h at h0) and the final step
    re-projects the clamped last block into a slot nobody reads; the
    out/resout index maps make the dead writes land on blocks that are
    rewritten (or identical) before their single flush.
    """
    l_idx = pl.program_id(2)
    n = n_state

    @pl.when(l_idx == 0)
    def _():
        h_scratch[:] = h0_ref[0]
        ctx_scr[:] = cstate_ref[0][1:, :].astype(jnp.float32)
        # Zero the "previous" slot so step 0's dead walk stays finite.
        delta2_scr[1] = jnp.zeros_like(delta2_scr[1])
        cy2_scr[1] = jnp.zeros_like(cy2_scr[1])
        z2_scr[1] = jnp.zeros_like(z2_scr[1])
        bc2_scr[1] = jnp.zeros_like(bc2_scr[1])

    def step(slot, prv):
        # ---- stage A: project block l (input block index clamped
        # upstream) into the `slot` buffers.
        res_out = (hid_ref[0].astype(jnp.float32)
                   + res_ref[0].astype(jnp.float32))
        resout_ref[0] = res_out.astype(resout_ref.dtype)
        if norm_rms:
            var = jnp.mean(jnp.square(res_out), axis=-1, keepdims=True)
            normed = res_out * jax.lax.rsqrt(var + eps)
        else:
            mu = jnp.mean(res_out, axis=-1, keepdims=True)
            cen = res_out - mu
            var = jnp.mean(jnp.square(cen), axis=-1, keepdims=True)
            normed = cen * jax.lax.rsqrt(var + eps)
        normed = normed * nw_ref[0][None, :] + nb_ref[0][None, :]

        precision = jax.lax.Precision.HIGHEST if highest else None
        mm0 = normed if highest else normed.astype(win_ref.dtype)
        xz = jax.lax.dot(mm0, win_ref[:].astype(mm0.dtype),
                         precision=precision,
                         preferred_element_type=jnp.float32)   # (c, 2Di)
        d_inner = win_ref.shape[1] // 2
        x = xz[:, :d_inner]
        z = xz[:, d_inner:]

        ctx = jnp.concatenate([ctx_scr[:], x], axis=0)      # (c+W-1, Di)
        w = convw_ref[:].astype(jnp.float32)
        cy = w[width - 1][None, :] * x
        for k in range(width - 1):
            cy = cy + w[k][None, :] * ctx[k:k + block_l]
        cy = cy + convb_ref[0][None, :]
        cy = cy * jax.nn.sigmoid(cy)
        ctx_scr[:] = x[block_l - (width - 1):, :]           # save for next

        mm1 = cy if highest else cy.astype(wx_ref.dtype)
        xdbl = jax.lax.dot(mm1, wx_ref[:].astype(mm1.dtype),
                           precision=precision,
                           preferred_element_type=jnp.float32)
        dt_in = xdbl[:, :PACK]
        dt_mm = dt_in if highest else dt_in.astype(wdt_ref.dtype)
        delta_raw = jax.lax.dot(dt_mm, wdt_ref[:].astype(dt_mm.dtype),
                                precision=precision,
                                preferred_element_type=jnp.float32)

        delta = jax.nn.softplus(delta_raw + dtbias_ref[0][None, :])
        row_ids = lax.broadcasted_iota(jnp.int32, (block_l, 1), 0)
        blk_start = jnp.minimum(l_idx, num_blocks - 1) * block_l
        valid = (blk_start + row_ids) < seqlen
        delta = jnp.where(valid, delta, 0.0)
        delta2_scr[slot] = delta
        cy2_scr[slot] = cy
        z2_scr[slot] = z.astype(z2_scr.dtype)
        bc2_scr[slot, :n, :] = xdbl[:, PACK:PACK + n].T
        bc2_scr[slot, n:2 * n, :] = xdbl[:, 2 * PACK:2 * PACK + n].T

        # ---- stage B: walk block l-1 from the previous slot.
        a_t = at_ref[:]
        b_blk = bc2_scr[prv, 0:n, :]                        # (N, c)
        c_blk = bc2_scr[prv, n:2 * n, :]
        time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)
        group = 8

        def body(g, h):
            base = g * group
            d_rows = delta2_scr[prv, pl.ds(base, group), :]
            du_rows = d_rows * cy2_scr[prv, pl.ds(base, group), :]
            dA8 = jnp.exp(d_rows[:, None, :] * a_t[None, :, :])
            ys = []
            for k in range(group):
                onehot = (time_ids == base + k).astype(jnp.float32)
                b_t = jnp.sum(b_blk * onehot, axis=1, keepdims=True)
                c_t = jnp.sum(c_blk * onehot, axis=1, keepdims=True)
                h = dA8[k] * h + du_rows[k:k + 1, :] * b_t
                ys.append(jnp.sum(c_t * h, axis=0, keepdims=True))
            yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
            return h

        # Statically unrolled — both for the ~70-80 ns/iteration fori_loop
        # cost and so stage A's matmuls share the basic block with this
        # serial chain.
        h_final = h_scratch[:]
        for g in range(block_l // group):
            h_final = body(g, h_final)
        h_scratch[:] = h_final
        hlast_ref[0] = h_final

        cy_prev = cy2_scr[prv]
        y = yacc_scr[:] + cy_prev * dskip_ref[0][None, :]
        zf = z2_scr[prv].astype(jnp.float32)
        y = y * (zf * jax.nn.sigmoid(zf))

        mm2 = y if highest else y.astype(wout_ref.dtype)
        out = jax.lax.dot(mm2, wout_ref[:].astype(mm2.dtype),
                          precision=precision,
                          preferred_element_type=jnp.float32)
        out_ref[0] = out.astype(out_ref.dtype)

    if static_parity:
        # Static parity specialization: a dynamic `l % 2` slot index costs
        # a per-access address computation inside the walk (measured ~20%
        # on Tiny serving); two statically-indexed copies keep every
        # scratch access at a fixed offset, and each pl.when body is still
        # one basic block so the stage-A matmuls overlap the serial walk.
        # Costs ~2x scoped-VMEM stack (the branches' stacks appear to sum
        # in the 16 MB accounting), so the wrapper only selects it for
        # small working sets; big models use the dynamic-slot form below.
        @pl.when(lax.rem(l_idx, 2) == 0)
        def _():
            step(0, 1)

        @pl.when(lax.rem(l_idx, 2) == 1)
        def _():
            step(1, 0)
    else:
        slot = lax.rem(l_idx, 2)
        step(slot, 1 - slot)


def block_fused_pallas(*args, **kwargs):
    """Whole-block fused forward (public entry).

    Reads the env knobs (VIDEOMAMBA_BLOCK_BLOCK_L / _PIPELINE / _STATIC)
    HERE, outside jit, and forwards them as static arguments so the jit
    cache key includes them — an in-process A/B sweep re-traces instead of
    silently reusing a stale kernel. (A caller that wraps this inside its
    own jit still freezes the knobs at that outer trace.)
    """
    env_bl = os.environ.get("VIDEOMAMBA_BLOCK_BLOCK_L")  # sweep knob
    if env_bl:
        kwargs["block_l"] = int(env_bl)
        kwargs["block_l_forced"] = True
    elif "block_l" in kwargs and kwargs["block_l"] != DEFAULT_BLOCK_L:
        kwargs["block_l_forced"] = True
    kwargs["pipeline_env"] = os.environ.get(
        "VIDEOMAMBA_BLOCK_PIPELINE", "1") != "0"
    kwargs["static_force"] = os.environ.get("VIDEOMAMBA_BLOCK_STATIC", "")
    return _block_fused_jit(*args, **kwargs)


@functools.partial(
    jax.jit,
    static_argnames=("norm_rms", "eps", "residual_fp32", "block_l",
                     "interpret", "checkpoints", "highest",
                     "block_l_forced", "pipeline_env", "static_force"),
)
def _block_fused_jit(
    hidden: Array,     # (B, L, E)
    residual: Array,   # (B, L, E) (zeros for the first block)
    norm_w: Array,     # (E,)
    norm_b: Optional[Array],
    win: Array,        # (E, 2*Di)
    wout: Array,       # (Di, E)
    conv_w: Array,     # (W, Di)
    conv_b: Array,     # (Di,)
    wx_pack: Array,    # (Di, 3*PACK)
    wdt_pack: Array,   # (PACK, Di)
    A: Array,          # (Di, N) f32
    D: Array,          # (Di,) f32
    dt_bias: Array,    # (Di,) f32
    h0: Array,         # (B, Di, N)
    conv_state: Array, # (B, Di, W)
    norm_rms: bool = True,
    eps: float = 1e-5,
    residual_fp32: bool = True,
    block_l: int = DEFAULT_BLOCK_L,
    interpret: bool = False,
    checkpoints: bool = False,
    highest: bool = False,
    block_l_forced: bool = False,
    pipeline_env: bool = True,
    static_force: str = "",
):
    """Whole-block fused forward.

    Returns (out (B, L, E), residual_out (B, L, E), h_last (B, Di, N)
    [, hckpt]).
    """
    from videomamba_tpu.ops.dispatch import interpret_mode

    if interpret_mode():
        interpret = True
    bsz, seqlen, e = hidden.shape
    d_inner = win.shape[1] // 2
    n = A.shape[1]
    width = conv_w.shape[0]

    block_l = min(block_l, max(8, seqlen))
    block_l = ((block_l + 7) // 8) * 8
    if block_l <= width:
        raise ValueError("block_l must exceed the conv width.")

    form = select_block_form(
        e=e, d_inner=d_inner, n=n, width=width, block_l=block_l,
        weight_itemsize=win.dtype.itemsize,
        hidden_itemsize=hidden.dtype.itemsize,
        residual_fp32=residual_fp32,
        f32_epilogue=(highest or hidden.dtype == jnp.float32),
        checkpoints=checkpoints, pipeline_env=pipeline_env,
        static_force=static_force, block_l_forced=block_l_forced,
    )
    pipelined = form.pipelined
    static_parity = form.static_parity
    vmem_raise = form.vmem_raise
    est = form.est
    pad = (-seqlen) % block_l
    lpad = seqlen + pad
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        residual = jnp.pad(residual, ((0, 0), (0, pad), (0, 0)))
    num_blocks = lpad // block_l

    a_t = A.T.astype(jnp.float32)
    dskip = D.astype(jnp.float32)[None, :]
    dtb = dt_bias.astype(jnp.float32)[None, :]
    h0_nd = h0.astype(jnp.float32).swapaxes(1, 2)
    cstate_wd = conv_state.swapaxes(1, 2)
    convb = conv_b.astype(jnp.float32)[None, :]
    nw = norm_w.astype(jnp.float32)[None, :]
    nb = (norm_b if norm_b is not None else jnp.zeros((e,), jnp.float32)
          ).astype(jnp.float32)[None, :]
    res_dtype = jnp.float32 if residual_fp32 else hidden.dtype

    # Serving path (no backward checkpoints): software-pipelined kernel —
    # one extra grid step, block l's projections co-scheduled with block
    # l-1's serial walk (see _block_kernel_pipelined). Training keeps the
    # plain kernel (the checkpoint stream couples the stages).
    if pipelined:
        grid = (bsz, 1, num_blocks + 1)
        kernel = functools.partial(
            _block_kernel_pipelined, block_l=block_l, width=width, n_state=n,
            seqlen=seqlen, num_blocks=num_blocks, norm_rms=norm_rms, eps=eps,
            highest=highest, static_parity=static_parity,
        )
        nb_clamp = num_blocks - 1
        full = lambda b, j, l: (b, jnp.minimum(l, nb_clamp), 0)  # noqa: E731
        lagged = lambda b, j, l: (b, jnp.maximum(l - 1, 0), 0)  # noqa: E731
    else:
        grid = (bsz, 1, num_blocks)
        kernel = functools.partial(
            _block_kernel, block_l=block_l, width=width, n_state=n,
            seqlen=seqlen, norm_rms=norm_rms, eps=eps, highest=highest,
            checkpoints=checkpoints,
        )
        full = lambda b, j, l: (b, l, 0)  # noqa: E731
        lagged = full
    fixed = lambda b, j, l: (0, 0)  # noqa: E731

    out_specs = [
        pl.BlockSpec((1, block_l, e), lagged, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_l, e), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, n, d_inner), lambda b, j, l: (b, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bsz, lpad, e), hidden.dtype),
        jax.ShapeDtypeStruct((bsz, lpad, e), res_dtype),
        jax.ShapeDtypeStruct((bsz, n, d_inner), jnp.float32),
    ]
    if checkpoints:
        out_specs.append(
            pl.BlockSpec((1, block_l // 8, n, d_inner),
                         lambda b, j, l: (b, l, 0, 0),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((bsz, lpad // 8, n, d_inner), jnp.float32)
        )

    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, e), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, e), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, e), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 2 * d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_inner, e), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((width, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((d_inner, 3 * PACK), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((PACK, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d_inner), fixed, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d_inner), lambda b, j, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, width, d_inner), lambda b, j, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [
                pltpu.VMEM((n, d_inner), jnp.float32),
                pltpu.VMEM((width - 1, d_inner), jnp.float32),
                pltpu.VMEM((2, block_l, d_inner), jnp.float32),   # delta
                pltpu.VMEM((2, block_l, d_inner), jnp.float32),   # conv out
                # Gate input: bf16 on the bf16 serving path (matches the
                # ambient precision and saves ~0.8 MB VMEM at Base);
                # full f32 when the computation itself is f32.
                pltpu.VMEM(
                    (2, block_l, d_inner),
                    jnp.float32
                    if (highest or hidden.dtype == jnp.float32)
                    else jnp.bfloat16,
                ),
                pltpu.VMEM((2, 2 * n, block_l), jnp.float32),     # B/C
                pltpu.VMEM((block_l, d_inner), jnp.float32),      # y acc
            ]
            if pipelined
            else [
                pltpu.VMEM((n, d_inner), jnp.float32),
                pltpu.VMEM((width - 1, d_inner), jnp.float32),
                pltpu.VMEM((block_l, d_inner), jnp.float32),
                pltpu.VMEM((block_l, d_inner), jnp.float32),
                pltpu.VMEM((block_l, d_inner), jnp.float32),
            ]
        ),
        interpret=interpret,
        # The static-parity form's two pl.when branch bodies stack their
        # scoped VMEM, overflowing the default 16 MB limit at Base
        # (17.75 MB) though the chip has far more physical VMEM. Raise the
        # limit when that form is forced past its gate, or when an explicit
        # block_l pushes the dynamic-slot form past the 18 MB window
        # (vmem_raise above); the default forms compile — and measure —
        # identically under the default limit.
        compiler_params=(
            pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
            if vmem_raise or (static_parity and est > 8 * 1024 * 1024)
            else None
        ),
    )(hidden, residual, nw, nb, win, wout, conv_w, convb, wx_pack, wdt_pack,
      a_t, dskip, dtb, h0_nd, cstate_wd)

    if checkpoints:
        out, res_out, h_last, hckpt = outs
    else:
        out, res_out, h_last = outs
    if pad:
        out = out[:, :seqlen]
        res_out = res_out[:, :seqlen]
    h_last = h_last.swapaxes(1, 2)
    if checkpoints:
        return out, res_out, h_last, hckpt
    return out, res_out, h_last
