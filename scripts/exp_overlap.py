"""Walk/MXU overlap probe (round 3: serving-chunk pipelining feasibility).

Question: the block-fused serving kernel runs, per 128-token time block,
~13 us of serial VPU walk and ~6.6 us of MXU projections, mostly back to
back (ROADMAP round-3 walk-floor analysis). The projections of block l+1 do
not depend on the walk of block l, so a software-pipelined kernel could hide
the MXU time entirely — IF Mosaic actually co-issues MXU ops with the serial
chain. The walk lives in a `lax.fori_loop`; ops outside the loop region
cannot be scheduled into it, so the only way to overlap is to place matmul
chunks INSIDE the loop body. This probe measures exactly that:

  walk     — production one-hot walk, nothing else (baseline)
  mmonly   — the same loop running only per-iteration matmul chunks
             ((c, E) @ (E, mmchunk) into an f32 accumulator slice)
  walkmm   — walk body + the independent matmul chunk in the SAME iteration

If t(walkmm) ~= t(walk) < t(walk) + t(mmonly), the pipelined block kernel is
worth building; if t(walkmm) ~= sum, the VLIW issue slots are already
saturated and the idea is dead.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_overlap.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    u_ref,        # (1, c, D)
    delta_ref,    # (1, c, D)
    b_ref,        # (1, N, c)
    c_ref,        # (1, N, c)
    at_ref,       # (N, D) f32
    h0_ref,       # (1, N, D) f32
    lhs_ref,      # (c, E) matmul LHS (loop-invariant)
    w_ref,        # (E, 16*mmchunk) resident weight
    y_ref,        # out (1, c, D)
    hlast_ref,    # out (1, N, D) f32
    acc_ref,      # out (c, 16*mmchunk) f32 (forces the matmul to be live)
    h_scratch, delta_scr, du_scr, yacc_scr,
    *,
    block_l: int,
    variant: str,
    mmchunk: int,
):
    l_idx = pl.program_id(1)

    @pl.when(l_idx == 0)
    def _():
        h_scratch[:] = h0_ref[0]

    delta = delta_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    delta_scr[:] = delta
    du_scr[:] = delta * u
    a_t = at_ref[:]
    group = 8
    b_blk = b_ref[0].astype(jnp.float32)
    c_blk = c_ref[0].astype(jnp.float32)
    time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)
    do_walk = variant in ("walk", "walkmm", "walkun", "walkunmm")
    do_mm = variant in ("mmonly", "walkmm")
    unrolled = variant in ("walkun", "walkunmm")

    def body(g, h):
        base = pl.multiple_of(g * group, group) if not unrolled else g * group
        if do_mm:
            col = pl.multiple_of(g * mmchunk, mmchunk)
            lhs = lhs_ref[:]
            rhs = w_ref[:, pl.ds(col, mmchunk)]
            acc_ref[:, pl.ds(col, mmchunk)] = jax.lax.dot(
                lhs, rhs, preferred_element_type=jnp.float32
            )
        if do_walk:
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(dr[:, None, :] * a_t[None, :, :])
            ys = []
            for k in range(group):
                onehot = (time_ids == base + k).astype(jnp.float32)
                b_t = jnp.sum(b_blk * onehot, axis=1, keepdims=True)
                c_t = jnp.sum(c_blk * onehot, axis=1, keepdims=True)
                h = dA8[k] * h + du_rows[k:k + 1, :] * b_t
                ys.append(jnp.sum(c_t * h, axis=0, keepdims=True))
            yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
        return h

    if unrolled:
        # Unrolled walk: every op lives in ONE basic block, so the VLIW
        # scheduler may interleave full-width matmuls with the serial chain
        # (no scf.for region boundary). walkunmm issues the whole 16*mmchunk
        # matmul as a single dot alongside the unrolled walk.
        if variant == "walkunmm":
            acc_ref[:] = jax.lax.dot(
                lhs_ref[:], w_ref[:], preferred_element_type=jnp.float32
            )
        h_final = h_scratch[:]
        for g in range(block_l // group):
            h_final = body(g, h_final)
    else:
        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])
    h_scratch[:] = h_final
    hlast_ref[0] = h_final
    y_ref[0] = yacc_scr[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_l", "variant", "mmchunk"))
def overlap_pallas(u, delta, b_nc, c_nc, a_t, h0, lhs, w, block_l, variant,
                   mmchunk):
    bsz, seqlen, d = u.shape
    n = a_t.shape[0]
    e = lhs.shape[1]
    num_blocks = seqlen // block_l
    grid = (bsz, num_blocks)
    full = lambda b, l: (b, l, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_kernel, block_l=block_l, variant=variant,
                          mmchunk=mmchunk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_l), lambda b, l: (b, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_l), lambda b, l: (b, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, e), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((e, 16 * mmchunk), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, 16 * mmchunk), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, seqlen, d), u.dtype),
            jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),
            jax.ShapeDtypeStruct((block_l, 16 * mmchunk), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
        ],
    )(u, delta, b_nc, c_nc, a_t, h0, lhs, w)


def time_chain(fn, args, iters=300):
    """Dependent-chain timing (perturb delta through exp; axon-safe)."""
    @jax.jit
    def run(n, *xs):
        u, delta, *rest = xs

        def step(i, carry):
            y, h, acc = fn(u, delta + carry * 1e-12, *rest)
            return (jnp.ravel(y)[0].astype(jnp.float32) + h[0, 0, 0]
                    + acc[0, 0] * 1e-20)
        return lax.fori_loop(0, n, step, jnp.zeros((), jnp.float32))

    jax.device_get(run(2, *args))
    samples = []
    for _ in range(3):
        t0 = time.perf_counter(); jax.device_get(run(2 + iters, *args))
        t1 = time.perf_counter(); jax.device_get(run(2, *args))
        t2 = time.perf_counter()
        samples.append(max(((t1 - t0) - (t2 - t1)) / iters, 1e-9))
    return sorted(samples)[1]


def main():
    key = jax.random.PRNGKey(0)
    # Base serving geometry: L = 64 frames * 196 patches, Di = 1536, E = 768.
    for name, L, d, e, mm_dtype in (
        ("base-bf16mm", 12544, 1536, 768, jnp.bfloat16),
        ("base-f32mm", 12544, 1536, 768, jnp.float32),
        ("tiny-bf16mm", 3072, 384, 192, jnp.bfloat16),
    ):
        n, bl = 16, 128
        ks = jax.random.split(key, 8)
        u = jax.random.normal(ks[0], (1, L, d), jnp.float32) * 0.5
        delta = jax.nn.softplus(jax.random.normal(ks[1], (1, L, d)) * 0.3)
        b_nc = jax.random.normal(ks[2], (1, n, L), jnp.float32)
        c_nc = jax.random.normal(ks[3], (1, n, L), jnp.float32)
        a_t = -jnp.abs(jax.random.normal(ks[4], (n, d), jnp.float32)) - 0.05
        h0 = jax.random.normal(ks[5], (1, n, d), jnp.float32) * 0.1
        for mmchunk in (128, 256):
            lhs = (jax.random.normal(ks[6], (bl, e), jnp.float32) * 0.1
                   ).astype(mm_dtype)
            w = (jax.random.normal(ks[7], (e, 16 * mmchunk), jnp.float32)
                 * 0.1).astype(mm_dtype)
            res = {}
            for variant in ("walk", "mmonly", "walkmm", "walkun", "walkunmm"):
                try:
                    sec = time_chain(
                        lambda *a: overlap_pallas(*a, bl, variant, mmchunk),
                        (u, delta, b_nc, c_nc, a_t, h0, lhs, w),
                        iters=1000 if L <= 4096 else 300,
                    )
                    res[variant] = sec
                    print(f"{name} mmchunk={mmchunk} {variant:7s}: "
                          f"{sec * 1e6:8.1f} us", flush=True)
                except Exception as ex:
                    print(f"{name} mmchunk={mmchunk} {variant}: FAIL "
                          f"{type(ex).__name__} {str(ex)[:160]}", flush=True)
            if "walkmm" in res:
                overlap = (res["walk"] + res["mmonly"] - res["walkmm"]) / min(
                    res["walk"], res["mmonly"])
                print(f"{name} mmchunk={mmchunk}: chunked overlap efficiency "
                      f"{overlap * 100:5.1f}% "
                      f"(100% = smaller side fully hidden)", flush=True)
            if "walkunmm" in res:
                overlap = (res["walkun"] + res["mmonly"] - res["walkunmm"]
                           ) / min(res["walkun"], res["mmonly"])
                print(f"{name} mmchunk={mmchunk}: unrolled overlap "
                      f"efficiency {overlap * 100:5.1f}% (mm side measured "
                      f"chunked; single-dot mm is cheaper)", flush=True)


if __name__ == "__main__":
    main()
