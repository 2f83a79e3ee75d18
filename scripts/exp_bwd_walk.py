"""Backward-walk layout experiments (round 3, VERDICT item 5).

The mixer backward kernel's reverse walk + batched gradient ops run
~1.68 ms/layer at Base train shapes (round-2 trace). The fwd-walk harness
(scripts/exp_walk.py) proved the fwd walk is issue-bound (pairwise chain
shortening adds work and time). Here: does converting the backward's
(8, N, Di) 3-D group tensors to 2-D (8N, Di) layouts (VERDICT's suggestion)
reduce Mosaic relayout overhead?

Variants replicate the scan-gradient core of mixer_bwd._mixer_bwd_kernel
(chains 1+2 plus every batched gradient contraction, minus the MXU
epilogue):
  v3d     — current structure: 3-D batched ops, jnp.stack groups
  v2d     — all group tensors as (8N, Di); static N-row slices per step
Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_bwd_walk.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bwd_kernel(
    u_ref,        # (1, c, D)  conv-out u
    delta_ref,    # (1, c, D)  softplus'd delta (pre-masked)
    g2_ref,       # (1, c, D)  gate-weighted cotangent rows
    b_ref,        # (1, c, N)
    c_ref,        # (1, c, N)
    at_ref,       # (N, D) f32
    hck_ref,      # (1, c//8, N, D) f32 group-entry states
    dy_ref,       # out (1, c, D)  ddelta rows (stand-in output)
    dcy_ref,      # out (1, c, D)
    da_ref,       # out (1, N, D)
    dh0_ref,      # out (1, N, D)
    s_scr, da_scr, b_scr, c_scr, delta_scr, du_scr, g2_scr,
    *,
    block_l: int,
    variant: str,
):
    l_idx = pl.program_id(1)
    n = at_ref.shape[0]
    group = 8
    num_groups = block_l // group

    @pl.when(l_idx == 0)
    def _():
        s_scr[:] = jnp.zeros_like(s_scr)
        da_scr[:] = jnp.zeros_like(da_scr)

    delta = delta_ref[0].astype(jnp.float32)
    u = u_ref[0].astype(jnp.float32)
    delta_scr[:] = delta
    du_scr[:] = delta * u
    g2_scr[:] = g2_ref[0].astype(jnp.float32)
    b_scr[:] = b_ref[0].astype(jnp.float32)
    c_scr[:] = c_ref[0].astype(jnp.float32)
    a_t = at_ref[:]

    if variant == "v3d":
        def bwd_body(gi, s):
            gidx = num_groups - 1 - gi
            base = pl.multiple_of(gidx * group, group)
            u_rows = None
            d_rows = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            g2_rows = g2_scr[pl.ds(base, group), :]
            b8 = b_scr[pl.ds(base, group), :]              # (8, N)
            c8 = c_scr[pl.ds(base, group), :]
            dA8 = jnp.exp(d_rows[:, None, :] * a_t[None, :, :])
            dub8 = b8[:, :, None] * du_rows[:, None, :]
            dyc8 = c8[:, :, None] * g2_rows[:, None, :]

            h = hck_ref[0, gidx].astype(jnp.float32)
            hs = [h]
            for k in range(group):
                h = dA8[k] * h + dub8[k]
                hs.append(h)
            hprev8 = jnp.stack(hs[:-1], axis=0)
            ht8 = jnp.stack(hs[1:], axis=0)

            dhs = [None] * group
            for k in reversed(range(group)):
                dh = dyc8[k] + s
                dhs[k] = dh
                s = dA8[k] * dh
            dh8 = jnp.stack(dhs, axis=0)

            da_a8 = dh8 * hprev8 * dA8
            da_scr[:] += jnp.sum(da_a8 * d_rows[:, None, :], axis=0)
            term1 = jnp.sum(da_a8 * a_t[None], axis=1)         # (8, D)
            sB8 = jnp.sum(dh8 * b8[:, :, None], axis=1)        # (8, D)
            ddelta = term1 + sB8 * du_rows
            dy_ref[0, pl.ds(base, group), :] = ddelta.astype(dy_ref.dtype)
            pre = jnp.sum(c8[:, :, None] * ht8, axis=1)        # (8, D)
            dcy_ref[0, pl.ds(base, group), :] = (
                d_rows * sB8 + g2_rows * pre
            ).astype(dcy_ref.dtype)
            return s

        s_final = lax.fori_loop(0, num_groups, bwd_body, s_scr[:])

    elif variant == "v2d":
        a_rep = jnp.concatenate([a_t] * group, axis=0)         # (8N, D)

        def bwd_body(gi, s):
            gidx = num_groups - 1 - gi
            base = pl.multiple_of(gidx * group, group)
            d_rows = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            g2_rows = g2_scr[pl.ds(base, group), :]
            b8 = b_scr[pl.ds(base, group), :]                  # (8, N)
            c8 = c_scr[pl.ds(base, group), :]
            # 2-D group tensors (8N, D): row k*N+n, built from sublane
            # broadcasts + concat (jnp.repeat/reshape crash Mosaic here).
            d = d_rows.shape[1]
            d_rep = jnp.concatenate(
                [jnp.broadcast_to(d_rows[k:k + 1], (n, d))
                 for k in range(group)], axis=0)
            du_rep = jnp.concatenate(
                [jnp.broadcast_to(du_rows[k:k + 1], (n, d))
                 for k in range(group)], axis=0)
            g2_rep = jnp.concatenate(
                [jnp.broadcast_to(g2_rows[k:k + 1], (n, d))
                 for k in range(group)], axis=0)
            b_flat = jnp.concatenate(
                [b8[k][:, None] for k in range(group)], axis=0)
            c_flat = jnp.concatenate(
                [c8[k][:, None] for k in range(group)], axis=0)
            dA_2d = jnp.exp(d_rep * a_rep)
            dub_2d = b_flat * du_rep
            dyc_2d = c_flat * g2_rep

            h = hck_ref[0, gidx].astype(jnp.float32)
            hs = [h]
            for k in range(group):
                h = dA_2d[k * n:(k + 1) * n] * h + dub_2d[k * n:(k + 1) * n]
                hs.append(h)
            hprev_2d = jnp.concatenate(hs[:-1], axis=0)        # (8N, D)
            ht_2d = jnp.concatenate(hs[1:], axis=0)

            dhs = [None] * group
            for k in reversed(range(group)):
                dh = dyc_2d[k * n:(k + 1) * n] + s
                dhs[k] = dh
                s = dA_2d[k * n:(k + 1) * n] * dh
            dh_2d = jnp.concatenate(dhs, axis=0)

            da_a = dh_2d * hprev_2d * dA_2d                    # (8N, D)
            acc = da_a[0:n] * d_rows[0:1]
            for k in range(1, group):
                acc = acc + da_a[k * n:(k + 1) * n] * d_rows[k:k + 1]
            da_scr[:] += acc
            # per-step N-reduces -> (8, D) rows
            t1, sb, pr = [], [], []
            for k in range(group):
                blk = slice(k * n, (k + 1) * n)
                t1.append(jnp.sum(da_a[blk] * a_t, axis=0, keepdims=True))
                sb.append(jnp.sum(dh_2d[blk] * b8[k][:, None], axis=0,
                                  keepdims=True))
                pr.append(jnp.sum(ht_2d[blk] * c8[k][:, None], axis=0,
                                  keepdims=True))
            term1 = jnp.concatenate(t1, axis=0)
            sB8 = jnp.concatenate(sb, axis=0)
            pre = jnp.concatenate(pr, axis=0)
            ddelta = term1 + sB8 * du_rows
            dy_ref[0, pl.ds(base, group), :] = ddelta.astype(dy_ref.dtype)
            dcy_ref[0, pl.ds(base, group), :] = (
                d_rows * sB8 + g2_rows * pre
            ).astype(dcy_ref.dtype)
            return s

        s_final = lax.fori_loop(0, num_groups, bwd_body, s_scr[:])

    elif variant in ("v2dun", "v2dmx"):
        # v2dun — v2d with the group loop statically unrolled (production
        #         structure after the round-3 unroll).
        # v2dmx — v2dun + every segment reduction and group broadcast
        #         offloaded to the MXU as 0/1-mask matmuls, co-issued with
        #         the serial VPU chains (the walk is one basic block, so
        #         Mosaic can interleave):
        #           reps:  (8N, 8) one-hot @ (8, D) rows
        #           sums:  (8, 8N) segment mask @ (8N, D) products
        use_mx = variant == "v2dmx"
        a_rep = jnp.concatenate([a_t] * group, axis=0)         # (8N, D)
        d = delta_scr.shape[1]
        if use_mx:
            col8 = lax.broadcasted_iota(jnp.int32, (group * n, 1), 0) // n
            rep_mask = (col8 == lax.broadcasted_iota(
                jnp.int32, (group * n, group), 1)).astype(jnp.float32)
            seg8 = rep_mask.T                                  # (8, 8N)
            segN = (lax.broadcasted_iota(jnp.int32, (n, group * n), 1) % n
                    == lax.broadcasted_iota(jnp.int32, (n, group * n), 0)
                    ).astype(jnp.float32)                      # (N, 8N)

        def bwd_body_un(gi, s):
            gidx = num_groups - 1 - gi
            base = gidx * group
            d_rows = delta_scr[pl.ds(base, group), :]
            du_rows = du_scr[pl.ds(base, group), :]
            g2_rows = g2_scr[pl.ds(base, group), :]
            b8 = b_scr[pl.ds(base, group), :]                  # (8, N)
            c8 = c_scr[pl.ds(base, group), :]
            if use_mx:
                hp = jax.lax.Precision.HIGHEST
                d_rep = jax.lax.dot(rep_mask, d_rows, precision=hp,
                                    preferred_element_type=jnp.float32)
                du_rep = jax.lax.dot(rep_mask, du_rows, precision=hp,
                                     preferred_element_type=jnp.float32)
                g2_rep = jax.lax.dot(rep_mask, g2_rows, precision=hp,
                                     preferred_element_type=jnp.float32)
            else:
                d_rep = jnp.concatenate(
                    [jnp.broadcast_to(d_rows[k:k + 1], (n, d))
                     for k in range(group)], axis=0)
                du_rep = jnp.concatenate(
                    [jnp.broadcast_to(du_rows[k:k + 1], (n, d))
                     for k in range(group)], axis=0)
                g2_rep = jnp.concatenate(
                    [jnp.broadcast_to(g2_rows[k:k + 1], (n, d))
                     for k in range(group)], axis=0)
            b_flat = jnp.concatenate(
                [b8[k][:, None] for k in range(group)], axis=0)
            c_flat = jnp.concatenate(
                [c8[k][:, None] for k in range(group)], axis=0)
            dA_2d = jnp.exp(d_rep * a_rep)
            dub_2d = b_flat * du_rep
            dyc_2d = c_flat * g2_rep

            h = hck_ref[0, gidx].astype(jnp.float32)
            hs = [h]
            for k in range(group):
                h = dA_2d[k * n:(k + 1) * n] * h + dub_2d[k * n:(k + 1) * n]
                hs.append(h)
            hprev_2d = jnp.concatenate(hs[:-1], axis=0)        # (8N, D)
            ht_2d = jnp.concatenate(hs[1:], axis=0)

            dhs = [None] * group
            for k in reversed(range(group)):
                dh = dyc_2d[k * n:(k + 1) * n] + s
                dhs[k] = dh
                s = dA_2d[k * n:(k + 1) * n] * dh
            dh_2d = jnp.concatenate(dhs, axis=0)

            da_a = dh_2d * hprev_2d * dA_2d                    # (8N, D)
            if use_mx:
                da_scr[:] += jax.lax.dot(
                    segN, da_a * d_rep, precision=hp,
                    preferred_element_type=jnp.float32)
                term1 = jax.lax.dot(seg8, da_a * a_rep, precision=hp,
                                    preferred_element_type=jnp.float32)
                sB8 = jax.lax.dot(seg8, dh_2d * b_flat, precision=hp,
                                  preferred_element_type=jnp.float32)
                pre = jax.lax.dot(seg8, ht_2d * c_flat, precision=hp,
                                  preferred_element_type=jnp.float32)
            else:
                acc = da_a[0:n] * d_rows[0:1]
                for k in range(1, group):
                    acc = acc + da_a[k * n:(k + 1) * n] * d_rows[k:k + 1]
                da_scr[:] += acc
                t1, sb, pr = [], [], []
                for k in range(group):
                    blk = slice(k * n, (k + 1) * n)
                    t1.append(jnp.sum(da_a[blk] * a_t, axis=0, keepdims=True))
                    sb.append(jnp.sum(dh_2d[blk] * b8[k][:, None], axis=0,
                                      keepdims=True))
                    pr.append(jnp.sum(ht_2d[blk] * c8[k][:, None], axis=0,
                                      keepdims=True))
                term1 = jnp.concatenate(t1, axis=0)
                sB8 = jnp.concatenate(sb, axis=0)
                pre = jnp.concatenate(pr, axis=0)
            ddelta = term1 + sB8 * du_rows
            dy_ref[0, pl.ds(base, group), :] = ddelta.astype(dy_ref.dtype)
            dcy_ref[0, pl.ds(base, group), :] = (
                d_rows * sB8 + g2_rows * pre
            ).astype(dcy_ref.dtype)
            return s

        s_final = s_scr[:]
        for gi in range(num_groups):
            s_final = bwd_body_un(gi, s_final)

    else:
        raise ValueError(variant)

    s_scr[:] = s_final
    dh0_ref[0] = s_final
    da_ref[0] = da_scr[:]


@functools.partial(jax.jit, static_argnames=("block_l", "variant"))
def bwd_pallas(u, delta, g2, b_cn, c_cn, a_t, hck, block_l, variant):
    bsz, seqlen, d = u.shape
    n = a_t.shape[0]
    num_blocks = seqlen // block_l
    grid = (bsz, num_blocks)
    full = lambda b, l: (b, l, 0)  # noqa: E731

    return pl.pallas_call(
        functools.partial(_bwd_kernel, block_l=block_l, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, n), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((n, d), lambda b, l: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l // 8, n, d), lambda b, l: (b, l, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_l, d), full, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, d), lambda b, l: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bsz, seqlen, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, seqlen, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),
            jax.ShapeDtypeStruct((bsz, n, d), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((n, d), jnp.float32),
            pltpu.VMEM((block_l, n), jnp.float32),
            pltpu.VMEM((block_l, n), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
            pltpu.VMEM((block_l, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(u, delta, g2, b_cn, c_cn, a_t, hck)


def time_chain(fn, args, iters=300):
    @jax.jit
    def run(nn, *xs):
        u, delta, *rest = xs

        def step(i, carry):
            outs = fn(u, delta + carry * 1e-12, *rest)
            return jnp.ravel(outs[0])[0] + outs[3][0, 0, 0]
        return lax.fori_loop(0, nn, step, jnp.zeros((), jnp.float32))

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

    # Base train geometry: L=1569 -> padded 1600; use 1600 directly.
    shapes = [("base-train", 4, 1600, 1536, 16, (64, 128))]
    key = jax.random.PRNGKey(0)
    for name, bsz, L, d, n, block_ls in shapes:
        ks = jax.random.split(key, 7)
        u = jax.random.normal(ks[0], (bsz, L, d), jnp.float32) * 0.5
        delta = jax.nn.softplus(jax.random.normal(ks[1], (bsz, L, d)) * 0.3)
        g2 = jax.random.normal(ks[2], (bsz, L, d), jnp.float32) * 0.1
        b_cn = jax.random.normal(ks[3], (bsz, L, n), jnp.float32)
        c_cn = jax.random.normal(ks[4], (bsz, L, n), jnp.float32)
        a_t = -jnp.abs(jax.random.normal(ks[5], (n, d), jnp.float32)) - 0.05
        hck = jax.random.normal(ks[6], (bsz, L // 8, n, d), jnp.float32) * 0.1

        for bl in block_ls:
            ref = None
            for variant in ("v3d", "v2d", "v2dun", "v2dmx"):
                try:
                    outs = bwd_pallas(u, delta, g2, b_cn, c_cn, a_t, hck,
                                      bl, variant)
                    outs[0].block_until_ready()
                    if ref is None:
                        ref = [np.asarray(o) for o in outs]
                    else:
                        errs = [float(np.max(np.abs(np.asarray(o) - r)))
                                for o, r in zip(outs, ref)]
                        if max(errs) > 1e-3:
                            print(f"{name} {variant} bl={bl}: WRONG {errs}",
                                  flush=True)
                            continue
                    sec = time_chain(
                        lambda *a: bwd_pallas(*a, bl, variant),
                        (u, delta, g2, b_cn, c_cn, a_t, hck), iters=200,
                    )
                    print(f"{name} {variant} bl={bl}: {sec * 1e6:8.1f} us",
                          flush=True)
                except Exception as e:
                    print(f"{name} {variant} bl={bl}: FAIL "
                          f"{type(e).__name__} {str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
