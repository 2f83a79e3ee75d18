"""ops/ssd.py — SSD (Mamba-2) scan: oracle vs numpy, chunked vs oracle,
gradients, streaming state, decode step.

Mirrors the test strategy of tests/test_selective_scan.py: a hand-rolled
numpy recurrence is the ground truth for ``ssd_ref``; everything faster is
pinned to ``ssd_ref``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomamba_tpu.ops.ssd import ssd_chunked, ssd_ref, ssd_state_update


def _case(seed=0, bsz=2, seqlen=37, nheads=4, hdim=8, ngroups=2, n=16,
          dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bsz, seqlen, nheads, hdim)), dtype)
    dt = jnp.asarray(rng.standard_normal((bsz, seqlen, nheads)), dtype)
    A = -jnp.exp(jnp.asarray(rng.uniform(0.0, 2.0, (nheads,)), jnp.float32))
    B = jnp.asarray(rng.standard_normal((bsz, seqlen, ngroups, n)), dtype)
    C = jnp.asarray(rng.standard_normal((bsz, seqlen, ngroups, n)), dtype)
    D = jnp.asarray(rng.standard_normal((nheads,)), jnp.float32)
    z = jnp.asarray(rng.standard_normal((bsz, seqlen, nheads, hdim)), dtype)
    dtb = jnp.asarray(rng.standard_normal((nheads,)), jnp.float32)
    h0 = jnp.asarray(
        rng.standard_normal((bsz, nheads, hdim, n)), jnp.float32
    )
    return x, dt, A, B, C, D, z, dtb, h0


def _numpy_ssd(x, dt, A, B, C, D, z, dtb, h0):
    bsz, seqlen, nheads, hdim = x.shape
    g = B.shape[2]
    dtp = np.logaddexp(0.0, np.asarray(dt, np.float64) + np.asarray(dtb))
    Bh = np.repeat(np.asarray(B, np.float64), nheads // g, axis=2)
    Ch = np.repeat(np.asarray(C, np.float64), nheads // g, axis=2)
    h = np.asarray(h0, np.float64).copy()
    ys = np.zeros((bsz, seqlen, nheads, hdim))
    for t in range(seqlen):
        dA = np.exp(dtp[:, t] * np.asarray(A))
        h = dA[:, :, None, None] * h + (
            dtp[:, t][:, :, None] * np.asarray(x)[:, t]
        )[..., None] * Bh[:, t][:, :, None, :]
        ys[:, t] = np.einsum("bhpn,bhn->bhp", h, Ch[:, t])
    ys = ys + np.asarray(D)[None, None, :, None] * np.asarray(x)
    zn = np.asarray(z, np.float64)
    ys = ys * (zn / (1.0 + np.exp(-zn)))
    return ys, h


def test_ref_matches_numpy():
    x, dt, A, B, C, D, z, dtb, h0 = _case()
    want_y, want_h = _numpy_ssd(x, dt, A, B, C, D, z, dtb, h0)
    y, h = ssd_ref(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                   initial_state=h0, return_last_state=True)
    np.testing.assert_allclose(np.asarray(y), want_y, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(h), want_h, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("chunk_size", [8, 16, 64])
@pytest.mark.parametrize("seqlen", [5, 16, 37])
def test_chunked_matches_ref(chunk_size, seqlen):
    x, dt, A, B, C, D, z, dtb, h0 = _case(seqlen=seqlen)
    want_y, want_h = ssd_ref(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                             initial_state=h0, return_last_state=True)
    y, h = ssd_chunked(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                       initial_state=h0, return_last_state=True,
                       chunk_size=chunk_size)
    np.testing.assert_allclose(np.asarray(y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)


def test_chunked_without_optional_args():
    x, dt, A, B, C, *_ = _case(ngroups=4)  # ngroups == nheads
    want = ssd_ref(x, dt, A, B, C)
    got = ssd_chunked(x, dt, A, B, C, chunk_size=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_chunked_gradients_match_ref():
    x, dt, A, B, C, D, z, dtb, h0 = _case(seqlen=21)

    def loss(fn, chunked):
        def f(x_, dt_, B_, C_, A_):
            kw = dict(D=D, z=z, dt_bias=dtb)
            if chunked:
                kw["chunk_size"] = 8
            return jnp.sum(jnp.sin(fn(x_, dt_, A_, B_, C_, **kw)))
        return f

    gc = jax.grad(loss(ssd_chunked, True), (0, 1, 2, 3, 4))(x, dt, B, C, A)
    gr = jax.grad(loss(ssd_ref, False), (0, 1, 2, 3, 4))(x, dt, B, C, A)
    for a, b, name in zip(gc, gr, ["x", "dt", "B", "C", "A"]):
        assert bool(jnp.isfinite(a).all()), f"NaN/inf in grad {name}"
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4, err_msg=name)


def test_streaming_two_chunks_equals_full():
    x, dt, A, B, C, D, z, dtb, h0 = _case(seqlen=32)
    full, h_full = ssd_chunked(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                               initial_state=h0, return_last_state=True,
                               chunk_size=8)
    cut = 13  # deliberately not a chunk multiple
    y1, h1 = ssd_chunked(x[:, :cut], dt[:, :cut], A, B[:, :cut], C[:, :cut],
                         D=D, z=z[:, :cut], dt_bias=dtb, initial_state=h0,
                         return_last_state=True, chunk_size=8)
    y2, h2 = ssd_chunked(x[:, cut:], dt[:, cut:], A, B[:, cut:], C[:, cut:],
                         D=D, z=z[:, cut:], dt_bias=dtb, initial_state=h1,
                         return_last_state=True, chunk_size=8)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], axis=1)), np.asarray(full),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h_full),
                               rtol=1e-5, atol=1e-5)


def test_state_update_chain_matches_ref():
    x, dt, A, B, C, D, z, dtb, h0 = _case(seqlen=6)
    want, want_h = ssd_ref(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                           initial_state=h0, return_last_state=True)
    h = h0
    ys = []
    for t in range(x.shape[1]):
        y_t, h = ssd_state_update(h, x[:, t], dt[:, t], A, B[:, t], C[:, t],
                                  D=D, z_t=z[:, t], dt_bias=dtb)
        ys.append(y_t)
    np.testing.assert_allclose(np.asarray(jnp.stack(ys, axis=1)),
                               np.asarray(want), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)


def test_bf16_inputs_run_and_track_fp32():
    x, dt, A, B, C, D, z, dtb, h0 = _case(seqlen=24)
    want = ssd_chunked(x, dt, A, B, C, D=D, z=z, dt_bias=dtb, chunk_size=8)
    got = ssd_chunked(x.astype(jnp.bfloat16), dt.astype(jnp.bfloat16), A,
                      B.astype(jnp.bfloat16), C.astype(jnp.bfloat16),
                      D=D, z=z.astype(jnp.bfloat16), dt_bias=dtb,
                      chunk_size=8)
    assert got.dtype == jnp.bfloat16
    rel = float(jnp.abs(got.astype(jnp.float32) - want).max()
                / (jnp.abs(want).max() + 1e-6))
    assert rel < 0.05, rel


def test_jit_stable_under_scan_of_chunks():
    """Chunked streaming inside one jit (lax.scan over chunks) — the serving
    pattern — is trace-stable and matches eager chunking."""
    x, dt, A, B, C, D, z, dtb, h0 = _case(seqlen=32)

    @jax.jit
    def run(xc, dtc, Bc, Cc, zc, h0_):
        def step(h, xs):
            x_, dt_, B_, C_, z_ = xs
            y, h_new = ssd_chunked(x_, dt_, A, B_, C_, D=D, z=z_, dt_bias=dtb,
                                   initial_state=h, return_last_state=True,
                                   chunk_size=8)
            return h_new, y
        return jax.lax.scan(step, h0_, (xc, dtc, Bc, Cc, zc))

    def split4(t):
        return t.reshape((4, t.shape[0], t.shape[1] // 4) + t.shape[2:], order="F") \
            if False else jnp.stack(jnp.split(t, 4, axis=1))

    h_last, ys = run(split4(x), split4(dt), split4(B), split4(C), split4(z), h0)
    want, want_h = ssd_chunked(x, dt, A, B, C, D=D, z=z, dt_bias=dtb,
                               initial_state=h0, return_last_state=True,
                               chunk_size=8)
    got = jnp.concatenate(list(ys), axis=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), np.asarray(want_h),
                               rtol=1e-5, atol=1e-5)
