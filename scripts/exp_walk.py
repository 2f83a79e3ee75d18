"""Walk-layout experiments for the fused block kernel (round 3, item 5/6).

Profiling (scripts/profile_chunk.py) shows the Tiny 16f chunk = 2.92 ms with
24 x 0.105 ms block_fused kernels (86%); each kernel's serial scan walk runs
~31 cycles/step. Hypothesis: the two 128-lane one-hot reductions per step
(B/C column extraction) dominate. Variant B stores B/C time-major (c, N) in
scratch, loads an 8-aligned (8, N) sublane tile per group, transposes that
tiny tile once, and per-step extraction becomes a STATIC lane slice.

Run on TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_walk.py
Results append to stdout; each variant ~1-4 min remote compile.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from videomamba_tpu.ops.pallas.mixer_fused import PACK, pack_weights


def _walk_kernel(
    u_ref,        # (1, c, D)   conv-out u (pre-computed; isolates the walk)
    delta_ref,    # (1, c, D)   softplus'd delta
    b_ref,        # (1, N, c)
    c_ref,        # (1, N, c)
    bt_ref,       # (1, c, N)   time-major copies for variant B
    ct_ref,       # (1, c, N)
    at_ref,       # (N, D) f32
    h0_ref,       # (1, N, D) f32
    y_ref,        # out (1, c, D)
    hlast_ref,    # out (1, N, D) f32
    h_scratch, delta_scr, du_scr, yacc_scr, bt_scr, ct_scr,
    *,
    block_l: int,
    variant: str,
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

    if variant == "onehot":
        b_blk = b_ref[0].astype(jnp.float32)
        c_blk = c_ref[0].astype(jnp.float32)
        time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
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

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    elif variant == "tmajor":
        bt_scr[:] = bt_ref[0].astype(jnp.float32)
        ct_scr[:] = ct_ref[0].astype(jnp.float32)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            gb = bt_scr[pl.ds(base, group), :]        # (8, N)
            gc = ct_scr[pl.ds(base, group), :]        # (8, N)
            gbT = gb.T                                 # (N, 8) tiny relayout
            gcT = gc.T
            dA8 = jnp.exp(dr[:, None, :] * a_t[None, :, :])
            ys = []
            for k in range(group):
                b_t = gbT[:, k:k + 1]                  # (N, 1) static slice
                c_t = gcT[:, k:k + 1]
                h = dA8[k] * h + du_rows[k:k + 1, :] * b_t
                ys.append(jnp.sum(c_t * h, axis=0, keepdims=True))
            yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
            return h

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    elif variant == "pair2":
        # Pairwise chain shortening: one chained madd per TWO time steps;
        # the pair combine (dA products, injection merge) and the
        # mid-step h for y extraction hang OFF the chain and overlap.
        b_blk = b_ref[0].astype(jnp.float32)
        c_blk = c_ref[0].astype(jnp.float32)
        time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(dr[:, None, :] * a_t[None, :, :])
            ys = []
            for k in range(0, group, 2):
                oh0 = (time_ids == base + k).astype(jnp.float32)
                oh1 = (time_ids == base + k + 1).astype(jnp.float32)
                b_t0 = jnp.sum(b_blk * oh0, axis=1, keepdims=True)
                c_t0 = jnp.sum(c_blk * oh0, axis=1, keepdims=True)
                b_t1 = jnp.sum(b_blk * oh1, axis=1, keepdims=True)
                c_t1 = jnp.sum(c_blk * oh1, axis=1, keepdims=True)
                inj0 = du_rows[k:k + 1, :] * b_t0
                inj1 = du_rows[k + 1:k + 2, :] * b_t1
                dA0 = dA8[k]
                dA1 = dA8[k + 1]
                h_mid = dA0 * h + inj0              # off-chain leaf (for y)
                h = (dA1 * dA0) * h + (dA1 * inj0 + inj1)   # chain: 1 madd
                ys.append(jnp.sum(c_t0 * h_mid, axis=0, keepdims=True))
                ys.append(jnp.sum(c_t1 * h, axis=0, keepdims=True))
            yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
            return h

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    elif variant == "pair4":
        # Quad combine: one chained madd per FOUR steps.
        b_blk = b_ref[0].astype(jnp.float32)
        c_blk = c_ref[0].astype(jnp.float32)
        time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(dr[:, None, :] * a_t[None, :, :])
            ys = []
            for k in range(0, group, 4):
                bt, ct, inj, dA = [], [], [], []
                for j in range(4):
                    oh = (time_ids == base + k + j).astype(jnp.float32)
                    bt.append(jnp.sum(b_blk * oh, axis=1, keepdims=True))
                    ct.append(jnp.sum(c_blk * oh, axis=1, keepdims=True))
                    inj.append(du_rows[k + j:k + j + 1, :] * bt[j])
                    dA.append(dA8[k + j])
                dA01 = dA[1] * dA[0]
                dA23 = dA[3] * dA[2]
                inj01 = dA[1] * inj[0] + inj[1]
                inj23 = dA[3] * inj[2] + inj[3]
                dAq = dA23 * dA01
                injq = dA23 * inj01 + inj23
                h0m = dA[0] * h + inj[0]            # leaves for y
                h1m = dA01 * h + inj01
                h2m = dA[2] * h1m + inj[2]
                h = dAq * h + injq                  # chain: 1 madd / 4 steps
                ys.append(jnp.sum(ct[0] * h0m, axis=0, keepdims=True))
                ys.append(jnp.sum(ct[1] * h1m, axis=0, keepdims=True))
                ys.append(jnp.sum(ct[2] * h2m, axis=0, keepdims=True))
                ys.append(jnp.sum(ct[3] * h, axis=0, keepdims=True))
            yacc_scr[pl.ds(base, group), :] = jnp.concatenate(ys, axis=0)
            return h

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    elif variant == "chain":
        # ABLATION: pure recurrence — extraction replaced by a fixed (N, 1)
        # vector, y written without the c-reduce. NOT numerically correct;
        # isolates the serial-chain + dA8 cost.
        b_fix = at_ref[:, 0:1] * 0.0 + 1.0            # (N, 1)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(dr[:, None, :] * a_t[None, :, :])
            for k in range(group):
                h = dA8[k] * h + du_rows[k:k + 1, :] * b_fix
            yacc_scr[pl.ds(base, group), :] = du_rows + h[0:1, :]
            return h

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    elif variant == "chainbf16":
        # ABLATION: pure recurrence with the 2-op chain in bf16 (h carry,
        # dA, du all bf16). Tests whether the VPU issues packed bf16
        # elementwise ops at 2x the f32 rate — if yes, a mixed-precision
        # walk (bf16 chain, fp32 group checkpoints) would halve serving
        # walk time. NOT numerically correct (ablation only).
        b_fix = (at_ref[:, 0:1] * 0.0 + 1.0).astype(jnp.bfloat16)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(
                dr[:, None, :] * a_t[None, :, :]
            ).astype(jnp.bfloat16)
            du8 = du_rows.astype(jnp.bfloat16)
            for k in range(group):
                h = dA8[k] * h + du8[k:k + 1, :] * b_fix
            yacc_scr[pl.ds(base, group), :] = (
                du_rows + h[0:1, :].astype(jnp.float32)
            )
            return h

        h_final = lax.fori_loop(
            0, block_l // group, body,
            h_scratch[:].astype(jnp.bfloat16),
        ).astype(jnp.float32)

    elif variant == "noexp":
        # ABLATION: chain without the per-group batched exp (dA8 replaced by
        # delta rows broadcast) — isolates the exp/broadcast cost.
        b_fix = at_ref[:, 0:1] * 0.0 + 1.0

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            for k in range(group):
                h = dr[k:k + 1, :] * h + du_rows[k:k + 1, :] * b_fix
            yacc_scr[pl.ds(base, group), :] = du_rows + h[0:1, :]
            return h

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    elif variant == "extract":
        # ABLATION: chain + B/C one-hot extraction, y without the c·h
        # sublane reduce — isolates the y-reduce cost by difference.
        b_blk = b_ref[0].astype(jnp.float32)
        c_blk = c_ref[0].astype(jnp.float32)
        time_ids = lax.broadcasted_iota(jnp.int32, (1, block_l), 1)

        def body(g, h):
            base = pl.multiple_of(g * group, group)
            dr = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(dr[:, None, :] * a_t[None, :, :])
            acc = du_rows * 0.0
            for k in range(group):
                onehot = (time_ids == base + k).astype(jnp.float32)
                b_t = jnp.sum(b_blk * onehot, axis=1, keepdims=True)
                c_t = jnp.sum(c_blk * onehot, axis=1, keepdims=True)
                h = dA8[k] * h + du_rows[k:k + 1, :] * b_t
                acc = acc + c_t[0:1] * h[0:1, :]
            yacc_scr[pl.ds(base, group), :] = acc
            return h

        h_final = lax.fori_loop(0, block_l // group, body, h_scratch[:])

    else:
        raise ValueError(variant)

    h_scratch[:] = h_final
    hlast_ref[0] = h_final
    y_ref[0] = yacc_scr[:].astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_l", "variant"))
def walk_pallas(u, delta, b_nc, c_nc, b_cn, c_cn, a_t, h0, block_l, variant):
    bsz, seqlen, d = u.shape
    n = a_t.shape[0]
    num_blocks = seqlen // block_l
    grid = (bsz, num_blocks)
    full = lambda b, l: (b, l, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_walk_kernel, block_l=block_l, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_l), lambda b, l: (b, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, block_l), lambda b, l: (b, 0, l),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda b, l: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, seqlen, d), u.dtype),
            jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, n), jnp.float32),
            pltpu.VMEM((block_l, n), jnp.float32),
        ],
    )(u, delta, b_nc, c_nc, b_cn, c_cn, a_t, h0)


def time_chain(fn, args, iters=200):
    """Dependent-chain per-iter seconds (axon-safe methodology).

    The walk is LINEAR in u, so a u-perturbation would be hoisted; the
    carry perturbs delta, which feeds exp() — forcing true sequencing.
    """
    @jax.jit
    def run(n, *xs):
        u, delta, *rest = xs

        def step(i, carry):
            y, h = fn(u, delta + carry * 1e-12, *rest)
            return jnp.ravel(y)[0].astype(jnp.float32) + h[0, 0, 0]
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
    import numpy as np

    shapes = [
        ("tiny", 1, 3072, 384, 16, (128,)),
        ("base", 1, 12544, 1536, 16, (128,)),
    ]
    key = jax.random.PRNGKey(0)
    for name, bsz, L, d, n, block_ls in shapes:
        ks = jax.random.split(key, 6)
        u = jax.random.normal(ks[0], (bsz, L, d), jnp.float32) * 0.5
        delta = jax.nn.softplus(jax.random.normal(ks[1], (bsz, L, d)) * 0.3)
        b_cn = jax.random.normal(ks[2], (bsz, L, n), jnp.float32)
        c_cn = jax.random.normal(ks[3], (bsz, L, n), jnp.float32)
        b_nc = b_cn.swapaxes(1, 2)
        c_nc = c_cn.swapaxes(1, 2)
        a_t = -jnp.abs(jax.random.normal(ks[4], (n, d), jnp.float32)) - 0.05
        h0 = jax.random.normal(ks[5], (bsz, n, d), jnp.float32) * 0.1

        ref = None
        for variant in ("onehot", "pair2", "pair4"):
            for bl in block_ls:
                try:
                    y, h = walk_pallas(u, delta, b_nc, c_nc, b_cn, c_cn,
                                       a_t, h0, bl, variant)
                    y.block_until_ready()
                    if ref is None:
                        ref = (np.asarray(y), np.asarray(h))
                    elif variant in ("onehot", "tmajor", "pair2", "pair4"):
                        err = np.max(np.abs(np.asarray(y) - ref[0]))
                        herr = np.max(np.abs(np.asarray(h) - ref[1]))
                        if err > 1e-3 or herr > 1e-3:
                            print(f"{name} {variant} bl={bl}: WRONG "
                                  f"y_err={err:.2e} h_err={herr:.2e}",
                                  flush=True)
                            continue
                    sec = time_chain(
                        lambda *a: walk_pallas(*a, bl, variant),
                        (u, delta, b_nc, c_nc, b_cn, c_cn, a_t, h0),
                        iters=2000 if name == "tiny" else 300,
                    )
                    print(f"{name} {variant:8s} bl={bl}: {sec * 1e6:8.1f} us",
                          flush=True)
                except Exception as e:
                    print(f"{name} {variant} bl={bl}: FAIL {type(e).__name__}"
                          f" {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
