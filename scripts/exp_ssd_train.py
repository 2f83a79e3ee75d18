"""Attribution of the Mamba-2 (SSD) training cost at Base train shapes.

Decomposes the isolated mixer fwd+bwd (exp_m2_mixer.py's ~2.9 ms/layer) into:
  fwd_plain   - serving fwd kernel (no checkpoints)
  fwd_ckpt    - training fwd kernel (checkpoints: entry states + pre-gate y)
  bwd_kernel  - the Pallas scan backward alone
  core_fb     - ssd_mixer_pallas value_and_grad (kernels + XLA glue,
                no projections)
  proj_fb     - in_proj/out_proj matmuls fwd+grad alone
  mixer_fb    - the whole Mamba2 mixer f+b (= exp_m2_mixer)

XLA-glue cost ~= core_fb - fwd_ckpt - bwd_kernel.
Usage: python scripts/exp_ssd_train.py [probe...]
"""
import os
import sys

# Tunnel RTT jitter is +-10-40 ms under contention: chains must be long
# enough that the differenced compute dwarfs it (~100+ iterations).
N_BIG = int(os.environ.get("EXP_NBIG", "120"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chain_seconds_per_iter  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# Base train shapes (B=4, L=1569 -> pad 1664 = 13 chunks of 128).
BSZ, L, D = 4, 1569, 768
H, P, G, N, Q = 24, 64, 1, 64, 128
DI = H * P                       # 1536
CD = DI + 2 * G * N              # 1664
DPJ = 2 * DI + 2 * G * N + H     # 3224
W = 4
LP = ((L + Q - 1) // Q) * Q      # 1664
NC = LP // Q


def _force(*arrays):
    """Reduce arrays to a scalar that requires FULL materialization.

    ``ravel()[0]`` alone lets XLA slice backward through dots (measured
    >2x over MXU peak = impossible); the ``sum(x*0)`` term is unfoldable
    under float semantics (NaN*0=NaN) and forces every element.
    """
    import jax.numpy as _jnp
    tot = _jnp.zeros((), _jnp.float32)
    for a in arrays:
        af = a.astype(_jnp.float32)
        tot = tot + _jnp.sum(af * 0) + af.ravel()[0]
    return tot.reshape(())


def _perturb(t, acc):
    # Data-dependent select: additive perturbations distribute through
    # linear ops and get hoisted (ROADMAP methodology note).
    return jnp.where(t > acc.astype(t.dtype), t, t + (acc * 1e-6).astype(t.dtype))


def _mk(key, shape, dtype=jnp.bfloat16):
    return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


def probe_fwd(checkpoints):
    from videomamba_tpu.ops.pallas.ssd_scan import _ssd_mixer_padded

    zx = _mk(0, (BSZ, LP, DPJ))
    dtp = jax.nn.softplus(_mk(1, (BSZ, LP, H), jnp.float32) * 0.3)
    A = -jnp.exp(_mk(2, (H,), jnp.float32) * 0.1)
    cst = jnp.zeros((BSZ, W, CD), jnp.bfloat16)
    cw = _mk(3, (W, CD)) * 0.2
    cb = jnp.zeros((1, CD), jnp.float32)
    h0 = jnp.zeros((BSZ, DI, N), jnp.float32)
    Dp = jnp.ones((H,), jnp.float32)
    nw = jnp.ones((1, DI), jnp.float32)

    def step(carry, zx, dtp, A, cst, cw, cb, h0, Dp, nw):
        outs = _ssd_mixer_padded(
            _perturb(zx, carry), dtp, A, cst, cw, cb, h0, Dp, nw,
            nheads=H, hdim=P, ngroups=G, d_state=N, d_inner=DI,
            conv_dim=CD, chunk_size=Q, checkpoints=checkpoints,
        )
        return outs[0].astype(jnp.float32).ravel()[:1].reshape(())

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32),
        xs=(zx, dtp, A, cst, cw, cb, h0, Dp, nw),
        n_small=4, n_big=N_BIG, repeats=5)


def probe_bwd_kernel():
    from videomamba_tpu.ops.pallas.ssd_scan import _ssd_bwd_padded

    x = _mk(0, (BSZ, LP, DI))
    dtp = jax.nn.softplus(_mk(1, (BSZ, LP, H), jnp.float32) * 0.3)
    A = -jnp.exp(_mk(2, (H,), jnp.float32) * 0.1)
    B = _mk(3, (BSZ, LP, G * N))
    C = _mk(4, (BSZ, LP, G * N))
    hins = _mk(5, (BSZ, NC, DI, N), jnp.float32)
    dy = _mk(6, (BSZ, LP, DI), jnp.float32)
    dhl = _mk(7, (BSZ, DI, N), jnp.float32)

    def step(carry, x, dtp, A, B, C, hins, dy, dhl):
        outs = _ssd_bwd_padded(
            _perturb(x, carry), dtp, A, B, C, hins, dy, dhl,
            nheads=H, hdim=P, ngroups=G, d_state=N, chunk_size=Q,
        )
        return outs[0].astype(jnp.float32).ravel()[:1].reshape(())

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32),
        xs=(x, dtp, A, B, C, hins, dy, dhl),
        n_small=4, n_big=N_BIG, repeats=5)


def probe_bwd_mega():
    """The mega-fused mixer backward kernel alone (in-kernel conv recompute
    + epilogue bwd + scan bwd + conv bwd -> dzx)."""
    from videomamba_tpu.ops.pallas.ssd_scan import _ssd_mixer_bwd_padded

    zx = _mk(0, (BSZ, LP, DPJ))
    dtp = jax.nn.softplus(_mk(1, (BSZ, LP, H), jnp.float32) * 0.3)
    A = -jnp.exp(_mk(2, (H,), jnp.float32) * 0.1)
    cst = jnp.zeros((BSZ, W, CD), jnp.bfloat16)
    cw = _mk(3, (W, CD)) * 0.2
    cb = jnp.zeros((1, CD), jnp.float32)
    yd = _mk(4, (BSZ, LP, DI))
    hins = _mk(5, (BSZ, NC, DI, N), jnp.float32)
    dout = _mk(6, (BSZ, LP, DI))
    dhl = _mk(7, (BSZ, DI, N), jnp.float32)
    Dp = jnp.ones((H,), jnp.float32)
    nw = jnp.ones((1, DI), jnp.float32)

    def step(carry, zx, dtp, A, cst, cw, cb, yd, hins, dout, dhl, Dp, nw):
        outs = _ssd_mixer_bwd_padded(
            _perturb(zx, carry), dtp, A, cst, cw, cb, yd, hins, dout, dhl,
            Dp, nw, nheads=H, hdim=P, ngroups=G, d_state=N, d_inner=DI,
            conv_dim=CD, chunk_size=Q,
        )
        return outs[0].astype(jnp.float32).ravel()[:1].reshape(())

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32),
        xs=(zx, dtp, A, cst, cw, cb, yd, hins, dout, dhl, Dp, nw),
        n_small=4, n_big=N_BIG, repeats=5)


def probe_core_fb():
    from videomamba_tpu.ops.pallas.ssd_scan import ssd_mixer_pallas

    zx = _mk(0, (BSZ, L, DPJ))
    A = -jnp.exp(_mk(2, (H,), jnp.float32) * 0.1)
    cw = _mk(3, (W, CD)) * 0.2
    cb = jnp.zeros((CD,), jnp.float32)
    Dp = jnp.ones((H,), jnp.float32)
    dtb = _mk(4, (H,), jnp.float32) * 0.1
    nw = jnp.ones((DI,), jnp.float32)

    def step(carry, zx, A, cw, cb, Dp, dtb, nw):
        def loss(zx_, cw_, nw_):
            y, _ = ssd_mixer_pallas(
                _perturb(zx_, carry), A, cw_, cb, Dp, dtb,
                norm_weight=nw_, chunk_size=Q,
                nheads=H, hdim=P, ngroups=G, d_state=N,
            )
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(zx, cw, nw)
        return _force(l.reshape(1), *grads)

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32), xs=(zx, A, cw, cb, Dp, dtb, nw),
        n_small=4, n_big=N_BIG, repeats=5)


def probe_proj_fb():
    xin = _mk(0, (BSZ, L, D))
    win = _mk(1, (D, DPJ)) * 0.02
    wout = _mk(2, (DI, D)) * 0.02

    def step(carry, xin, win, wout):
        def loss(w1, w2):
            zx = _perturb(xin, carry) @ w1
            y = zx[..., :DI] @ w2
            return jnp.sum(y.astype(jnp.float32) ** 2)

        l, (g1, g2) = jax.value_and_grad(loss, argnums=(0, 1))(win, wout)
        return _force(l.reshape(1), g1, g2)

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32), xs=(xin, win, wout),
        n_small=4, n_big=N_BIG, repeats=5)


def probe_mixer_fb():
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=D, d_state=N, headdim=P, chunk_size=Q, layer_idx=0)
    p = m.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    x = _mk(1, (BSZ, L, D))

    def step(carry, x_arg, p_arg):
        def loss(pp):
            out = m(pp, _perturb(x_arg, carry))
            return jnp.sum(out.astype(jnp.float32) ** 2)

        l, g = jax.value_and_grad(loss)(p_arg)
        return _force(l.reshape(1), *jax.tree_util.tree_leaves(g))

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32), xs=(x, p),
        n_small=4, n_big=max(N_BIG // 2, 20), repeats=5)


def probe_train_depth(depth):
    """Full m2 train step at a given depth (for marginal-per-layer
    attribution by depth differencing within one process)."""
    import optax
    from videomamba_tpu.parallel.train_step import make_train_step

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from exp_ssd import m2_base

    model = m2_base(num_frames=8, chunk_size=Q, d_state=N, depth=depth)
    tx = optax.adamw(1e-4, weight_decay=0.05)
    params = model.params
    opt_state = jax.jit(tx.init)(params)
    video = jax.random.normal(
        jax.random.PRNGKey(0), (BSZ, 3, 8, 224, 224), jnp.float32)
    out_shape = jax.eval_shape(
        lambda p, v: model.apply(p, v, deterministic=True), params, video)
    x_vis = out_shape[0] if isinstance(out_shape, tuple) else out_shape
    target = jnp.zeros(x_vis.shape, jnp.float32)
    train_step = make_train_step(
        model, tx, compute_dtype=jnp.bfloat16, donate=False)

    def step(carry, video, target, rng):
        p, o, s = carry
        p, o, s, _ = train_step(p, o, s, {"video": video, "target": target},
                                rng)
        return (p, o, s)

    return _chain_seconds_per_iter(
        step, (params, opt_state, jnp.zeros((), jnp.int32)),
        xs=(video, target, jax.random.PRNGKey(1)),
        n_small=2, n_big=max(N_BIG // 4, 16), repeats=5)


PROBES = {
    "fwd_plain": lambda: probe_fwd(False),
    "fwd_ckpt": lambda: probe_fwd(True),
    "bwd_kernel": probe_bwd_kernel,
    "bwd_mega": probe_bwd_mega,
    "core_fb": probe_core_fb,
    "proj_fb": probe_proj_fb,
    "mixer_fb": probe_mixer_fb,
    "train24": lambda: probe_train_depth(24),
    "train12": lambda: probe_train_depth(12),
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        sec = PROBES[name]()
        print({"probe": name, "ms_per_layer": round(sec * 1e3, 3)}, flush=True)
