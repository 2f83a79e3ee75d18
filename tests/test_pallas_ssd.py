"""Pallas SSD kernel vs the XLA chunked core (interpret mode on CPU).

The kernel (ops/pallas/ssd_scan.py) must match ssd_core_chunked — the
numerical reference both are tested against (ops/ssd.py docstring contract)
— to fp32 round-off, including streamed initial/last state and gradients
(custom_vjp through the XLA core).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops.ssd import _prepare_dt, ssd_chunked, ssd_core_chunked
from videomamba_tpu.ops.pallas.ssd_scan import ssd_core_pallas


def _inputs(seed=0, bsz=2, seqlen=48, nheads=4, hdim=16, ngroups=2, n=16,
            dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(seed), 6)
    x = jax.random.normal(ks[0], (bsz, seqlen, nheads, hdim), dtype)
    dt = jax.random.normal(ks[1], (bsz, seqlen, nheads), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (nheads,), jnp.float32))
    B = jax.random.normal(ks[3], (bsz, seqlen, ngroups, n), dtype)
    C = jax.random.normal(ks[4], (bsz, seqlen, ngroups, n), dtype)
    dt_bias = jax.random.normal(ks[5], (nheads,), jnp.float32) * 0.1
    return x, dt, A, B, C, dt_bias


@pytest.mark.parametrize("chunk_size,seqlen", [(16, 48), (16, 40), (32, 32)])
def test_kernel_matches_chunked_core(chunk_size, seqlen):
    x, dt, A, B, C, dt_bias = _inputs(seqlen=seqlen)
    dt_p = _prepare_dt(dt, dt_bias, True)
    y_ref, h_ref = ssd_core_chunked(x, dt_p, A, B, C, None,
                                    chunk_size=chunk_size)
    y, h = ssd_core_pallas(x, dt_p, A, B, C, None, chunk_size=chunk_size,
                           interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_streams_initial_state():
    x, dt, A, B, C, dt_bias = _inputs(seed=1, seqlen=64)
    dt_p = _prepare_dt(dt, dt_bias, True)
    h0 = jax.random.normal(jax.random.PRNGKey(9),
                           (2, 4, 16, 16), jnp.float32) * 0.3

    y_full, h_full = ssd_core_pallas(x, dt_p, A, B, C, h0, chunk_size=16,
                                     interpret=True)
    y1, h1 = ssd_core_pallas(x[:, :32], dt_p[:, :32], A, B[:, :32],
                             C[:, :32], h0, chunk_size=16, interpret=True)
    y2, h2 = ssd_core_pallas(x[:, 32:], dt_p[:, 32:], A, B[:, 32:],
                             C[:, 32:], h1, chunk_size=16, interpret=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_full),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full),
                               rtol=2e-5, atol=2e-5)


def test_kernel_gradients_match_chunked():
    x, dt, A, B, C, dt_bias = _inputs(seed=2, seqlen=32)
    dt_p = _prepare_dt(dt, dt_bias, True)
    h0 = jnp.zeros((2, 4, 16, 16), jnp.float32)

    def loss(core):
        def f(args):
            y, h = core(*args, chunk_size=16)
            return jnp.sum(y ** 2) + jnp.sum(h ** 2)
        return f

    args = (x, dt_p, A, B, C, h0)
    g_ref = jax.grad(loss(ssd_core_chunked))(args)
    g_pal = jax.grad(loss(
        lambda *a, chunk_size: ssd_core_pallas(*a, chunk_size=chunk_size,
                                               interpret=True)))(args)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        # rtol 2e-4: the Pallas backward reassociates reductions (per-head
        # MXU contractions vs XLA's batched einsums); finite differences
        # confirm both are exact to FD noise — this is f32 round-off, and
        # any logic error shows up as O(1) relative error.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_method_kwarg_routes_through_ssd_chunked(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    x, dt, A, B, C, dt_bias = _inputs(seed=3, seqlen=40)
    D = jnp.ones((4,), jnp.float32)
    out_ref, h_ref = ssd_chunked(
        x, dt, A, B, C, D=D, dt_bias=dt_bias, initial_state=None,
        return_last_state=True, chunk_size=16, method="chunked")
    out_pal, h_pal = ssd_chunked(
        x, dt, A, B, C, D=D, dt_bias=dt_bias, initial_state=None,
        return_last_state=True, chunk_size=16, method="pallas")
    np.testing.assert_allclose(np.asarray(out_pal), np.asarray(out_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_pal), np.asarray(h_ref),
                               rtol=2e-5, atol=2e-5)


def test_mixer_uses_pallas_in_interpret_mode(monkeypatch):
    """End-to-end: the Mamba2 mixer picks the kernel and matches the XLA path."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=96, d_state=32, headdim=24, ngroups=2, chunk_size=16,
               layer_idx=0)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 21, 96), jnp.float32)
    y_pal = m(p, x)

    monkeypatch.setenv("VIDEOMAMBA_SSD_METHOD", "chunked")
    y_xla = m(p, x)
    np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_xla),
                               rtol=2e-5, atol=2e-5)


def test_mixer_gradients_pallas_vs_chunked(monkeypatch):
    """Gradients through the fused gated kernel (custom_vjp -> XLA twin)
    equal the plain chunked mixer path."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=96, d_state=32, headdim=24, ngroups=2, chunk_size=16,
               layer_idx=0)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 24, 96), jnp.float32)

    def loss(pp):
        return jnp.sum(m(pp, x) ** 2)

    g_pal = jax.grad(loss)(p)
    monkeypatch.setenv("VIDEOMAMBA_SSD_METHOD", "chunked")
    g_xla = jax.grad(loss)(p)
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_xla)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_mixer_streaming_pallas_matches_full(monkeypatch):
    """Chunked streaming through the conv-fused kernel (conv window honored
    at chunk boundaries) equals the full run, and states match the XLA path."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=96, d_state=32, headdim=24, ngroups=2, chunk_size=16,
               layer_idx=0)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 96), jnp.float32)
    full, (conv_f, ssm_f) = m(p, x, state=m.allocate_state(2),
                              return_state=True)
    st = m.allocate_state(2)
    y1, st = m(p, x[:, :15], state=st, return_state=True)
    y2, st = m(p, x[:, 15:], state=st, return_state=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(full),
        rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(conv_f),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(st[1]), np.asarray(ssm_f),
                               rtol=2e-5, atol=2e-5)


def test_bf16_gradients_run_and_match_dtypes():
    """bf16 primals (the training preset) must get bf16 cotangents back from
    the Pallas backward — custom_vjp asserts dtype equality."""
    x, dt, A, B, C, dt_bias = _inputs(seed=5, seqlen=32, dtype=jnp.bfloat16)
    dt_p = _prepare_dt(dt, dt_bias, True)
    h0 = jnp.zeros((2, 4, 16, 16), jnp.float32)

    def loss(args):
        y, h = ssd_core_pallas(*args, chunk_size=16, interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2) + jnp.sum(h ** 2)

    g = jax.grad(loss)((x, dt_p, A, B, C, h0))
    assert g[0].dtype == jnp.bfloat16 and g[3].dtype == jnp.bfloat16
    assert all(bool(jnp.isfinite(a.astype(jnp.float32)).all())
               for a in jax.tree_util.tree_leaves(g))


def test_bf16_kernel_tracks_fp32():
    x, dt, A, B, C, dt_bias = _inputs(seed=4, seqlen=32)
    dt_p = _prepare_dt(dt, dt_bias, True)
    y32, _ = ssd_core_pallas(x, dt_p, A, B, C, None, chunk_size=16,
                             interpret=True)
    y16, _ = ssd_core_pallas(
        x.astype(jnp.bfloat16), dt_p, A, B.astype(jnp.bfloat16),
        C.astype(jnp.bfloat16), None, chunk_size=16, interpret=True)
    rel = float(jnp.abs(y16 - y32).max() / (jnp.abs(y32).max() + 1e-6))
    assert rel < 0.06, rel


@pytest.mark.parametrize("use_norm,use_state", [
    (True, True), (True, False), (False, True), (False, False),
])
def test_mega_fused_backward_matches_composite(monkeypatch, use_norm,
                                               use_state):
    """The one-kernel mixer backward (_ssd_mixer_bwd_padded: in-kernel conv
    recompute + epilogue/D-skip grads + reverse-chunk scan bwd + conv bwd,
    emitting dzx directly) must match the composite route (XLA conv
    recompute + epilogue vjp around the bare scan-bwd kernel) <=2e-5 on
    every cotangent — unaligned L (pad path), multi-group, multi-head."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    from videomamba_tpu.ops.pallas.ssd_scan import ssd_mixer_pallas

    H, P, G, N, Q = 4, 8, 2, 8, 16
    DI = H * P
    CD = DI + 2 * G * N
    DPJ = 2 * DI + 2 * G * N + H
    B, L = 2, 35  # not a multiple of Q
    k = jax.random.PRNGKey
    zx = jax.random.normal(k(0), (B, L, DPJ), jnp.float32)
    A = -jnp.exp(jax.random.normal(k(1), (H,), jnp.float32) * 0.2)
    cw = jax.random.normal(k(2), (4, CD), jnp.float32) * 0.3
    cb = jax.random.normal(k(3), (CD,), jnp.float32) * 0.1
    D = jax.random.normal(k(4), (H,), jnp.float32) * 0.5
    dtb = jax.random.normal(k(5), (H,), jnp.float32) * 0.1
    nw = 1.0 + jax.random.normal(k(6), (DI,), jnp.float32) * 0.1
    h0 = jax.random.normal(k(7), (B, H, P, N), jnp.float32) * 0.2
    cst = jax.random.normal(k(8), (B, CD, 4), jnp.float32) * 0.2

    def loss(zx, cw, cb, D, dtb, nw, h0, cst, A):
        y, hl = ssd_mixer_pallas(
            zx, A, cw, cb, D, dtb,
            initial_state=h0 if use_state else None,
            conv_state=cst if use_state else None,
            norm_weight=nw if use_norm else None,
            chunk_size=Q, nheads=H, hdim=P, ngroups=G, d_state=N)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 0.5 + jnp.sum(hl ** 2) * 0.25

    grads = {}
    for mode in ("fused", "composite"):
        monkeypatch.setenv("VIDEOMAMBA_SSD_BWD", mode)
        grads[mode] = jax.grad(loss, argnums=tuple(range(9)))(
            zx, cw, cb, D, dtb, nw, h0, cst, A)
    for i, (gf, gc) in enumerate(zip(grads["fused"], grads["composite"])):
        scale = float(jnp.max(jnp.abs(gc))) + 1e-30
        err = float(jnp.max(jnp.abs(gf - gc))) / scale
        assert err <= 2e-5, f"arg {i}: rel err {err:.3e}"


@pytest.mark.parametrize("use_norm,use_state", [(True, True), (False, False)])
def test_merged_backward_matches_perhead(monkeypatch, use_norm, use_state):
    """The MXU-merged mega-backward (ngroups == 1: per-head decay scales
    hoisted onto shared operands, state scratch transposed to (N, DI)) must
    match the per-head kernel <=2e-5 on every cotangent — unaligned L (pad
    path), with/without norm and streaming state."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VIDEOMAMBA_SSD_BWD", "fused")
    from videomamba_tpu.ops.pallas.ssd_scan import ssd_mixer_pallas

    H, P, G, N, Q = 4, 8, 1, 8, 16
    DI = H * P
    CD = DI + 2 * G * N
    DPJ = 2 * DI + 2 * G * N + H
    B, L = 2, 35  # not a multiple of Q
    k = jax.random.PRNGKey
    zx = jax.random.normal(k(0), (B, L, DPJ), jnp.float32)
    A = -jnp.exp(jax.random.normal(k(1), (H,), jnp.float32) * 0.2)
    cw = jax.random.normal(k(2), (4, CD), jnp.float32) * 0.3
    cb = jax.random.normal(k(3), (CD,), jnp.float32) * 0.1
    D = jax.random.normal(k(4), (H,), jnp.float32) * 0.5
    dtb = jax.random.normal(k(5), (H,), jnp.float32) * 0.1
    nw = 1.0 + jax.random.normal(k(6), (DI,), jnp.float32) * 0.1
    h0 = jax.random.normal(k(7), (B, H, P, N), jnp.float32) * 0.2
    cst = jax.random.normal(k(8), (B, CD, 4), jnp.float32) * 0.2

    def loss(zx, cw, cb, D, dtb, nw, h0, cst, A):
        y, hl = ssd_mixer_pallas(
            zx, A, cw, cb, D, dtb,
            initial_state=h0 if use_state else None,
            conv_state=cst if use_state else None,
            norm_weight=nw if use_norm else None,
            chunk_size=Q, nheads=H, hdim=P, ngroups=G, d_state=N)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 0.5 + jnp.sum(hl ** 2) * 0.25

    grads = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("VIDEOMAMBA_SSD_BWD_MERGED", mode)
        grads[mode] = jax.grad(loss, argnums=tuple(range(9)))(
            zx, cw, cb, D, dtb, nw, h0, cst, A)
    for i, (gm, gp) in enumerate(zip(grads["1"], grads["0"])):
        scale = float(jnp.max(jnp.abs(gp))) + 1e-30
        err = float(jnp.max(jnp.abs(gm - gp))) / scale
        assert err <= 2e-5, f"arg {i}: rel err {err:.3e}"


def test_merged_forward_matches_perhead(monkeypatch):
    """The MXU-merged forward walk (ngroups == 1) must match the per-head
    forward on y and hlast, with streaming state and norm."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    from videomamba_tpu.ops.pallas.ssd_scan import ssd_mixer_pallas

    H, P, G, N, Q = 4, 8, 1, 8, 16
    DI = H * P
    CD = DI + 2 * G * N
    DPJ = 2 * DI + 2 * G * N + H
    k = jax.random.PRNGKey
    zx = jax.random.normal(k(0), (2, 35, DPJ), jnp.float32)
    A = -jnp.exp(jax.random.normal(k(1), (H,), jnp.float32) * 0.2)
    cw = jax.random.normal(k(2), (4, CD), jnp.float32) * 0.3
    cb = jax.random.normal(k(3), (CD,), jnp.float32) * 0.1
    D = jax.random.normal(k(4), (H,), jnp.float32) * 0.5
    dtb = jax.random.normal(k(5), (H,), jnp.float32) * 0.1
    nw = 1.0 + jax.random.normal(k(6), (DI,), jnp.float32) * 0.1
    h0 = jax.random.normal(k(7), (2, H, P, N), jnp.float32) * 0.2
    cst = jax.random.normal(k(8), (2, CD, 4), jnp.float32) * 0.2

    outs = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("VIDEOMAMBA_SSD_FWD_MERGED", mode)
        outs[mode] = ssd_mixer_pallas(
            zx, A, cw, cb, D, dtb, initial_state=h0, conv_state=cst,
            norm_weight=nw, chunk_size=Q, nheads=H, hdim=P, ngroups=G,
            d_state=N)
    for name, a, b in (("y", outs["1"][0], outs["0"][0]),
                       ("hlast", outs["1"][1], outs["0"][1])):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err <= 2e-5, f"{name}: rel err {err:.3e}"


@pytest.mark.parametrize("fwd,bwd_merged,bwd_mode", [
    ("1", "1", "fused"),       # both merged (default): zero hins relayouts
    ("1", "0", "fused"),       # merged fwd feeding the PER-HEAD mega-bwd
    ("0", "1", "fused"),       # per-head fwd feeding the merged bwd
    ("1", "1", "composite"),   # merged fwd feeding the composite bwd
])
def test_merged_fwd_bwd_combinations(monkeypatch, fwd, bwd_merged,
                                     bwd_mode):
    """Every fwd/bwd kernel combination must agree with the all-per-head
    baseline <=2e-5 — this pins the hins residual-layout plumbing (the
    merged forward emits transposed (B, nc, N, DI) checkpoints)."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    from videomamba_tpu.ops.pallas.ssd_scan import ssd_mixer_pallas

    H, P, G, N, Q = 4, 8, 1, 8, 16
    DI = H * P
    CD = DI + 2 * G * N
    DPJ = 2 * DI + 2 * G * N + H
    k = jax.random.PRNGKey
    zx = jax.random.normal(k(0), (2, 35, DPJ), jnp.float32)
    A = -jnp.exp(jax.random.normal(k(1), (H,), jnp.float32) * 0.2)
    cw = jax.random.normal(k(2), (4, CD), jnp.float32) * 0.3
    cb = jax.random.normal(k(3), (CD,), jnp.float32) * 0.1
    D = jax.random.normal(k(4), (H,), jnp.float32) * 0.5
    dtb = jax.random.normal(k(5), (H,), jnp.float32) * 0.1
    nw = 1.0 + jax.random.normal(k(6), (DI,), jnp.float32) * 0.1
    h0 = jax.random.normal(k(7), (2, H, P, N), jnp.float32) * 0.2
    cst = jax.random.normal(k(8), (2, CD, 4), jnp.float32) * 0.2

    def loss(zx, cw, cb, D, dtb, nw, h0, cst, A):
        y, hl = ssd_mixer_pallas(
            zx, A, cw, cb, D, dtb, initial_state=h0, conv_state=cst,
            norm_weight=nw, chunk_size=Q, nheads=H, hdim=P, ngroups=G,
            d_state=N)
        return jnp.sum(y.astype(jnp.float32) ** 2) * 0.5 + jnp.sum(hl ** 2) * 0.25

    def grads_at(fwd_, bwd_merged_, bwd_mode_):
        monkeypatch.setenv("VIDEOMAMBA_SSD_FWD_MERGED", fwd_)
        monkeypatch.setenv("VIDEOMAMBA_SSD_BWD_MERGED", bwd_merged_)
        monkeypatch.setenv("VIDEOMAMBA_SSD_BWD", bwd_mode_)
        return jax.grad(loss, argnums=tuple(range(9)))(
            zx, cw, cb, D, dtb, nw, h0, cst, A)

    base = grads_at("0", "0", "fused")
    got = grads_at(fwd, bwd_merged, bwd_mode)
    for i, (ga, gb) in enumerate(zip(got, base)):
        scale = float(jnp.max(jnp.abs(gb))) + 1e-30
        err = float(jnp.max(jnp.abs(ga - gb))) / scale
        assert err <= 2e-5, f"arg {i}: rel err {err:.3e}"


def test_merged_pmixer_forward_and_grads(monkeypatch):
    """Projected-mixer route: merged fwd+bwd (default) vs all-per-head on
    output and every gradient (ngroups == 1)."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=128, d_state=8, headdim=8, ngroups=1,
               chunk_size=16, layer_idx=0)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 35, 128), jnp.float32)

    def loss(pp, xx):
        return jnp.sum(m(pp, xx).astype(jnp.float32) ** 2)

    res = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("VIDEOMAMBA_SSD_FWD_MERGED", mode)
        monkeypatch.setenv("VIDEOMAMBA_SSD_BWD_MERGED", mode)
        res[mode] = (m(p, x), jax.grad(loss, argnums=(0, 1))(p, x))
    ya, yb = res["1"][0], res["0"][0]
    err = float(jnp.max(jnp.abs(ya - yb))) / (float(jnp.max(jnp.abs(yb))) + 1e-30)
    assert err <= 2e-5, f"y: {err:.3e}"
    for a, b in zip(jax.tree_util.tree_leaves(res["1"][1]),
                    jax.tree_util.tree_leaves(res["0"][1])):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err <= 2e-5, err


def test_merged_pmixer_backward_matches_perhead(monkeypatch):
    """Same A/B for the one-kernel projected-mixer backward (ssd_block.py):
    the merged scan core composed with the in/out_proj gradient structure.
    Pins TRAIN_ROUTE=pmixer — the default route would bypass this kernel
    under jax.grad (ops.dispatch.ssd_train_route)."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
    monkeypatch.setenv("VIDEOMAMBA_SSD_TRAIN_ROUTE", "pmixer")
    from videomamba_tpu.models.mamba2 import Mamba2

    m = Mamba2(d_model=128, d_state=8, headdim=8, ngroups=1,
               chunk_size=16, layer_idx=0)
    p = m.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 35, 128), jnp.float32)

    def loss(pp, xx):
        return jnp.sum(m(pp, xx).astype(jnp.float32) ** 2)

    grads = {}
    for mode in ("1", "0"):
        monkeypatch.setenv("VIDEOMAMBA_SSD_BWD_MERGED", mode)
        grads[mode] = jax.grad(loss, argnums=(0, 1))(p, x)
    for a, b in zip(jax.tree_util.tree_leaves(grads["1"]),
                    jax.tree_util.tree_leaves(grads["0"])):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err <= 2e-5, err


def test_mega_fused_backward_bf16_dtypes(monkeypatch):
    """bf16 primals through the mega-fused backward: cotangent dtypes match
    primals (custom_vjp contract) and are finite."""
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("VIDEOMAMBA_SSD_BWD", "fused")
    from videomamba_tpu.ops.pallas.ssd_scan import ssd_mixer_pallas

    H, P, G, N, Q = 4, 8, 1, 8, 16
    DI = H * P
    CD = DI + 2 * G * N
    DPJ = 2 * DI + 2 * G * N + H
    zx = jax.random.normal(jax.random.PRNGKey(0), (2, 32, DPJ), jnp.bfloat16)
    A = -jnp.exp(jax.random.normal(jax.random.PRNGKey(1), (H,), jnp.float32) * 0.2)
    cw = jax.random.normal(jax.random.PRNGKey(2), (4, CD), jnp.bfloat16) * 0.3
    cb = jnp.zeros((CD,), jnp.float32)
    D = jnp.ones((H,), jnp.float32)
    dtb = jnp.zeros((H,), jnp.float32)

    def loss(zx_, cw_):
        y, hl = ssd_mixer_pallas(
            zx_, A, cw_, cb, D, dtb, chunk_size=Q,
            nheads=H, hdim=P, ngroups=G, d_state=N)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gz, gw = jax.grad(loss, argnums=(0, 1))(zx, cw)
    assert gz.dtype == jnp.bfloat16 and gw.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(gz.astype(jnp.float32)).all())
    assert bool(jnp.isfinite(gw.astype(jnp.float32)).all())


class TestProjectedMixer:
    """ssd_block.py: in/out_proj fused into the scan kernel (both
    directions) must match the mixer-level route exactly."""

    def _mixer(self):
        from videomamba_tpu.models.mamba2 import Mamba2

        m = Mamba2(d_model=128, d_state=8, headdim=8, ngroups=2,
                   chunk_size=16, layer_idx=0)
        p = m.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 35, 128),
                              jnp.float32)
        return m, p, x

    def test_forward_matches_mixer_route(self, monkeypatch):
        monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
        m, p, x = self._mixer()
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
        y_pm = m(p, x)
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "0")
        y_mx = m(p, x)
        np.testing.assert_allclose(np.asarray(y_pm), np.asarray(y_mx),
                                   rtol=2e-5, atol=2e-5)

    @pytest.mark.parametrize("route", ["mixer", "pmixer"])
    def test_gradients_match_mixer_route(self, monkeypatch, route):
        """Both differentiated routes of the projected-mixer op (the
        decomposed default and the one-kernel pmixer pair) must match the
        model-level mixer route's gradients."""
        monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VIDEOMAMBA_SSD_TRAIN_ROUTE", route)
        m, p, x = self._mixer()

        def loss(pp, xx):
            return jnp.sum(m(pp, xx).astype(jnp.float32) ** 2)

        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
        g_pm = jax.grad(loss, argnums=(0, 1))(p, x)
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "0")
        g_mx = jax.grad(loss, argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_pm),
                        jax.tree_util.tree_leaves(g_mx)):
            scale = float(jnp.max(jnp.abs(b))) + 1e-30
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err <= 2e-5, err

    def test_train_route_streaming_grads_match(self, monkeypatch):
        """Route parity WITH streaming state threaded through the op: both
        custom-vjp routes must agree on every cotangent including the
        conv/ssm state gradients."""
        monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
        m, p, x = self._mixer()
        st = (jnp.zeros((2, m.conv_dim, m.d_conv), jnp.float32),
              0.1 * jax.random.normal(
                  jax.random.PRNGKey(7),
                  (2, m.nheads, m.headdim, m.d_state), jnp.float32))

        def loss(pp, xx, st_):
            y, (cs, ss) = m(pp, xx, state=st_, return_state=True)
            return (jnp.sum(y.astype(jnp.float32) ** 2)
                    + jnp.sum(ss.astype(jnp.float32) ** 2) * 0.5)

        grads = {}
        for route in ("mixer", "pmixer"):
            monkeypatch.setenv("VIDEOMAMBA_SSD_TRAIN_ROUTE", route)
            grads[route] = jax.grad(loss, argnums=(0, 1, 2))(p, x, st)
        for a, b in zip(jax.tree_util.tree_leaves(grads["mixer"]),
                        jax.tree_util.tree_leaves(grads["pmixer"])):
            scale = float(jnp.max(jnp.abs(b))) + 1e-30
            err = float(jnp.max(jnp.abs(a - b))) / scale
            assert err <= 2e-5, err

    def test_streaming_matches_full(self, monkeypatch):
        monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
        m, p, x = self._mixer()
        y_full = m(p, x[:, :32])
        st = (jnp.zeros((2, m.conv_dim, m.d_conv), jnp.float32),
              jnp.zeros((2, m.nheads, m.headdim, m.d_state), jnp.float32))
        y1, st = m(p, x[:, :16], state=st, return_state=True)
        y2, st = m(p, x[:, 16:32], state=st, return_state=True)
        y_stream = jnp.concatenate([y1, y2], axis=1)
        np.testing.assert_allclose(np.asarray(y_stream),
                                   np.asarray(y_full),
                                   rtol=2e-5, atol=2e-5)

    def test_bias_falls_back(self, monkeypatch):
        """Projection biases are outside the kernel contract: the gate must
        route to the mixer-level path (which supports them)."""
        monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
        from videomamba_tpu.models.mamba2 import Mamba2

        m = Mamba2(d_model=128, d_state=8, headdim=8, ngroups=2,
                   chunk_size=16, bias=True, layer_idx=0)
        p = m.init(jax.random.PRNGKey(0))
        assert not m._pmixer_ok(p)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 128),
                              jnp.float32)
        monkeypatch.setenv("VIDEOMAMBA_SSD_METHOD", "chunked")
        y_ref = m(p, x)
        monkeypatch.delenv("VIDEOMAMBA_SSD_METHOD")
        y = m(p, x)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bf16_dtypes_finite(self, monkeypatch):
        monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
        monkeypatch.setenv("VIDEOMAMBA_SSD_PMIXER", "1")
        from videomamba_tpu.models.mamba2 import Mamba2

        m = Mamba2(d_model=128, d_state=8, headdim=8, chunk_size=16,
                   layer_idx=0)
        p = m.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 128),
                              jnp.bfloat16)

        def loss(pp):
            return jnp.sum(m(pp, x).astype(jnp.float32) ** 2)

        g = jax.grad(loss)(p)
        assert g["in_proj"]["kernel"].dtype == jnp.bfloat16
        assert all(bool(jnp.isfinite(a.astype(jnp.float32)).all())
                   for a in jax.tree_util.tree_leaves(g))
