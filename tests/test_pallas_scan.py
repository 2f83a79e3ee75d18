"""Pallas selective-scan kernel vs the XLA oracle (interpret mode on CPU).

The compiled kernel is additionally exercised on real TPU by bench.py; this
suite pins the semantics: same contract as selective_scan_bld, including
initial_state carry, return_last_state, padding tails, and the custom-vjp
(XLA-recompute) backward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops.selective_scan import selective_scan_bld


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


def _inputs(key, bsz=1, L=24, d=128, n=16, dtype=jnp.float32):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    u = jax.random.normal(ks[0], (bsz, L, d), dtype)
    delta = jax.random.normal(ks[1], (bsz, L, d), dtype) * 0.2
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (bsz, L, n), dtype)
    C = jax.random.normal(ks[4], (bsz, L, n), dtype)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, L, d), dtype)
    dbias = jnp.linspace(-0.1, 0.2, d)
    return u, delta, A, B, C, D, z, dbias


@pytest.mark.slow
def test_matches_xla_chunked_full_featured():
    u, delta, A, B, C, D, z, dbias = _inputs(0)
    h0 = jax.random.normal(jax.random.PRNGKey(9), (1, 128, 16), jnp.float32) * 0.1
    kw = dict(delta_bias=dbias, delta_softplus=True, initial_state=h0,
              return_last_state=True)
    y_x, h_x = selective_scan_bld(u, delta, A, B, C, D, z=z, method="chunked", **kw)
    y_p, h_p = selective_scan_bld(u, delta, A, B, C, D, z=z, method="pallas", **kw)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)


def test_padding_tail_and_no_optionals():
    # L=19 is not a multiple of the 8-step group: exercises -inf delta padding.
    u, delta, A, B, C, _, _, _ = _inputs(1, L=19)
    y_x, h_x = selective_scan_bld(
        u, delta, A, B, C, delta_softplus=True, return_last_state=True,
        method="chunked",
    )
    y_p, h_p = selective_scan_bld(
        u, delta, A, B, C, delta_softplus=True, return_last_state=True,
        method="pallas",
    )
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x), rtol=1e-5, atol=1e-5)


def test_streaming_split_equals_full():
    u, delta, A, B, C, D, z, dbias = _inputs(2, L=32)
    kw = dict(delta_bias=dbias, delta_softplus=True, method="pallas")
    full = selective_scan_bld(u, delta, A, B, C, D, z=z, **kw)
    y1, h = selective_scan_bld(
        u[:, :13], delta[:, :13], A, B[:, :13], C[:, :13], D, z=z[:, :13],
        return_last_state=True, **kw,
    )
    y2 = selective_scan_bld(
        u[:, 13:], delta[:, 13:], A, B[:, 13:], C[:, 13:], D, z=z[:, 13:],
        initial_state=h, **kw,
    )
    stitched = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=1e-5, atol=1e-5
    )


def test_unsupported_shapes_fall_back_to_xla():
    # d=48 is not 128-aligned: must silently take the exact XLA path.
    u, delta, A, B, C, D, z, dbias = _inputs(3, d=48)
    y = selective_scan_bld(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        method="pallas",
    )
    y_ref = selective_scan_bld(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        method="chunked",
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_custom_vjp_matches_xla_gradients():
    u, delta, A, B, C, D, z, dbias = _inputs(4, L=16)

    def loss(method):
        def f(u_, delta_, A_, B_, C_):
            y = selective_scan_bld(
                u_, delta_, A_, B_, C_, D, z=z, delta_bias=dbias,
                delta_softplus=True, method=method,
            )
            return jnp.sum(y * y)
        return f

    g_p = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    g_x = jax.grad(loss("chunked"), argnums=(0, 1, 2, 3, 4))(u, delta, A, B, C)
    for gp, gx in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-4)
