"""Pallas fused add-norm kernel vs the XLA composition (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops.norm import fused_add_norm


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


@pytest.mark.parametrize("norm_type", ["rms", "layer"])
@pytest.mark.parametrize("residual_in_fp32", [True, False])
def test_prenorm_matches_xla(norm_type, residual_in_fp32):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 37, 128), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(1), (2, 37, 128), jnp.float32)
    w = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (128,), jnp.float32)
    b = 0.1 * jax.random.normal(jax.random.PRNGKey(3), (128,), jnp.float32)
    bias = b if norm_type == "layer" else None

    kw = dict(residual=res, prenorm=True, residual_in_fp32=residual_in_fp32,
              norm_type=norm_type)
    n_x, r_x = fused_add_norm(x, w, bias, use_pallas=False, **kw)
    n_p, r_p = fused_add_norm(x, w, bias, use_pallas=True, **kw)
    np.testing.assert_allclose(np.asarray(n_p), np.asarray(n_x), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r_p), np.asarray(r_x), rtol=1e-6, atol=1e-6)
    assert r_p.dtype == r_x.dtype


def test_postnorm_and_no_residual():
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 9, 256), jnp.float32)
    w = jnp.ones((256,), jnp.float32)
    out_x = fused_add_norm(x, w, prenorm=False, norm_type="rms", use_pallas=False)
    out_p = fused_add_norm(x, w, prenorm=False, norm_type="rms", use_pallas=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x), rtol=1e-6, atol=1e-6)


def test_unaligned_feature_dim_falls_back():
    # D=96 is not lane-aligned: must take the XLA path silently.
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 5, 96), jnp.float32)
    w = jnp.ones((96,), jnp.float32)
    out = fused_add_norm(x, w, prenorm=False, norm_type="rms", use_pallas=True)
    ref = fused_add_norm(x, w, prenorm=False, norm_type="rms", use_pallas=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_gradients_flow_through_pallas_norm():
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 16, 128), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(7), (1, 16, 128), jnp.float32)
    w = jnp.ones((128,), jnp.float32)

    def loss(x_):
        n, r = fused_add_norm(
            x_, w, residual=res, prenorm=True, residual_in_fp32=True,
            norm_type="rms", use_pallas=True,
        )
        return jnp.sum(n * n) + jnp.sum(r)

    g = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    # Compare against XLA-path gradients.
    def loss_ref(x_):
        n, r = fused_add_norm(
            x_, w, residual=res, prenorm=True, residual_in_fp32=True,
            norm_type="rms", use_pallas=False,
        )
        return jnp.sum(n * n) + jnp.sum(r)

    g_ref = jax.grad(loss_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("norm_type", ["rms", "layer"])
@pytest.mark.parametrize("prenorm", [True, False])
def test_pallas_backward_all_gradients(norm_type, prenorm, monkeypatch):
    """One-pass Pallas backward vs XLA autodiff on every cotangent."""
    monkeypatch.setenv("VIDEOMAMBA_NORM_BWD", "pallas")
    x = jax.random.normal(jax.random.PRNGKey(8), (2, 37, 128), jnp.float32)
    res = jax.random.normal(jax.random.PRNGKey(9), (2, 37, 128), jnp.float32)
    w = 1.0 + 0.1 * jax.random.normal(jax.random.PRNGKey(10), (128,))
    bias = (0.1 * jax.random.normal(jax.random.PRNGKey(11), (128,))
            if norm_type == "layer" else None)
    gn = jax.random.normal(jax.random.PRNGKey(12), (2, 37, 128), jnp.float32)
    gr = jax.random.normal(jax.random.PRNGKey(13), (2, 37, 128), jnp.float32)

    def loss(use_pallas, x_, w_, b_, r_):
        out = fused_add_norm(
            x_, w_, b_, residual=r_, prenorm=prenorm,
            residual_in_fp32=True, norm_type=norm_type,
            use_pallas=use_pallas,
        )
        if prenorm:
            n, r2 = out
            return jnp.sum(n * gn) + jnp.sum(r2 * gr)
        return jnp.sum(out * gn)

    argnums = (0, 1, 3) if bias is None else (0, 1, 2, 3)
    g_x = jax.grad(lambda *a: loss(False, *a), argnums=argnums)(
        x, w, bias, res)
    g_p = jax.grad(lambda *a: loss(True, *a), argnums=argnums)(
        x, w, bias, res)
    for a, b in zip(g_x, g_p):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)
