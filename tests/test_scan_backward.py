"""Hand-derived selective-scan backward vs true autodiff (method='ref').

Both production paths (chunked XLA and Pallas) share the manual backward
(_fused_scan_bwd_impl), so this file is the gradient ground-truth gate:
every cotangent (du, ddelta, dA, dB, dC, dD, dz, dbias, dh0) is compared
against differentiating the sequential reference scan.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops.selective_scan import selective_scan_bld


def _inputs(key, bsz=2, L=23, d=8, n=4):
    ks = jax.random.split(jax.random.PRNGKey(key), 8)
    u = jax.random.normal(ks[0], (bsz, L, d), jnp.float32)
    delta = jax.random.normal(ks[1], (bsz, L, d), jnp.float32) * 0.4
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (bsz, L, n), jnp.float32)
    C = jax.random.normal(ks[4], (bsz, L, n), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, L, d), jnp.float32)
    dbias = jnp.linspace(-0.2, 0.3, d)
    h0 = 0.3 * jax.random.normal(ks[7], (bsz, d, n), jnp.float32)
    return u, delta, A, B, C, D, z, dbias, h0


NAMES = ["du", "ddelta", "dA", "dB", "dC", "dD", "dz", "dbias", "dh0"]


@pytest.mark.slow
def test_full_featured_gradients_match_ref_autodiff():
    u, delta, A, B, C, D, z, dbias, h0 = _inputs(0)
    bsz, L, d = u.shape
    cot_y = jax.random.normal(jax.random.PRNGKey(9), (bsz, L, d), jnp.float32)
    cot_h = jax.random.normal(jax.random.PRNGKey(10), h0.shape, jnp.float32)

    def loss(method):
        def f(u_, delta_, A_, B_, C_, D_, z_, dbias_, h0_):
            y, h = selective_scan_bld(
                u_, delta_, A_, B_, C_, D_, z=z_, delta_bias=dbias_,
                delta_softplus=True, initial_state=h0_,
                return_last_state=True, method=method, chunk_size=5,
            )
            return jnp.sum(y * cot_y) + jnp.sum(h * cot_h)
        return f

    args = (u, delta, A, B, C, D, z, dbias, h0)
    g_ref = jax.grad(loss("ref"), argnums=tuple(range(9)))(*args)
    g_man = jax.grad(loss("chunked"), argnums=tuple(range(9)))(*args)
    for name, gr, gm in zip(NAMES, g_ref, g_man):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), rtol=1e-4, atol=1e-5,
            err_msg=f"gradient mismatch for {name}",
        )


@pytest.mark.slow
def test_no_optionals_gradients_match_ref_autodiff():
    u, delta, A, B, C, _, _, _, _ = _inputs(1, L=16)
    cot = jax.random.normal(jax.random.PRNGKey(11), u.shape, jnp.float32)

    def loss(method):
        def f(u_, delta_, A_, B_, C_):
            y = selective_scan_bld(
                u_, delta_, A_, B_, C_, delta_softplus=True,
                method=method, chunk_size=8,
            )
            return jnp.sum(y * cot)
        return f

    g_ref = jax.grad(loss("ref"), argnums=tuple(range(5)))(u, delta, A, B, C)
    g_man = jax.grad(loss("chunked"), argnums=tuple(range(5)))(u, delta, A, B, C)
    for name, gr, gm in zip(NAMES[:5], g_ref, g_man):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), rtol=1e-4, atol=1e-5,
            err_msg=f"gradient mismatch for {name}",
        )


@pytest.mark.slow
def test_no_softplus_gradients_match():
    u, delta, A, B, C, D, z, _, h0 = _inputs(2, L=12)
    # Keep delta positive so the no-softplus regime is well-conditioned.
    delta = jnp.abs(delta) * 0.3
    cot = jax.random.normal(jax.random.PRNGKey(12), u.shape, jnp.float32)

    def loss(method):
        def f(u_, delta_):
            y = selective_scan_bld(
                u_, delta_, A, B, C, D, z=z, delta_softplus=False,
                initial_state=h0, method=method, chunk_size=4,
            )
            return jnp.sum(y * cot)
        return f

    g_ref = jax.grad(loss("ref"), argnums=(0, 1))(u, delta)
    g_man = jax.grad(loss("chunked"), argnums=(0, 1))(u, delta)
    for gr, gm in zip(g_ref, g_man):
        np.testing.assert_allclose(
            np.asarray(gm), np.asarray(gr), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
def test_pallas_path_uses_same_backward(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")
    u, delta, A, B, C, D, z, dbias, h0 = _inputs(3, d=128, n=16, L=16)
    cot = jax.random.normal(jax.random.PRNGKey(13), u.shape, jnp.float32)

    def loss(method):
        def f(u_, delta_):
            y = selective_scan_bld(
                u_, delta_, A, B, C, D, z=z, delta_bias=dbias,
                delta_softplus=True, initial_state=h0, method=method,
            )
            return jnp.sum(y * cot)
        return f

    g_ref = jax.grad(loss("ref"), argnums=(0, 1))(u, delta)
    g_pal = jax.grad(loss("pallas"), argnums=(0, 1))(u, delta)
    for gr, gp in zip(g_ref, g_pal):
        np.testing.assert_allclose(
            np.asarray(gp), np.asarray(gr), rtol=1e-4, atol=1e-5
        )
