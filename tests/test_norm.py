"""Fused add-norm: numerics and prenorm/residual dtype semantics."""

import numpy as np

import jax
import jax.numpy as jnp

from videomamba_tpu.ops import fused_add_norm, layer_norm, rms_norm


def _np_rms(x, w, eps):
    x = np.asarray(x, dtype=np.float64)
    var = np.mean(x * x, axis=-1, keepdims=True)
    return x / np.sqrt(var + eps) * np.asarray(w, dtype=np.float64)


def _np_ln(x, w, b, eps):
    x = np.asarray(x, dtype=np.float64)
    mu = x.mean(axis=-1, keepdims=True)
    var = ((x - mu) ** 2).mean(axis=-1, keepdims=True)
    y = (x - mu) / np.sqrt(var + eps) * np.asarray(w, dtype=np.float64)
    return y + np.asarray(b, dtype=np.float64)


def test_rms_and_layer_norm_match_numpy():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 5, 16), jnp.float32)
    w = 1.0 + 0.1 * jax.random.normal(ks[1], (16,), jnp.float32)
    b = 0.1 * jax.random.normal(ks[2], (16,), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(rms_norm(x, w, 1e-5)), _np_rms(x, w, 1e-5), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(layer_norm(x, w, b, 1e-5)), _np_ln(x, w, b, 1e-5), rtol=1e-5, atol=1e-6
    )


def test_fused_add_norm_prenorm_returns_sum_residual():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 4, 8), jnp.float32)
    res = jax.random.normal(ks[1], (2, 4, 8), jnp.float32)
    w = jnp.ones((8,), jnp.float32)

    normed, res_out = fused_add_norm(
        x, w, residual=res, prenorm=True, residual_in_fp32=True, norm_type="rms"
    )
    np.testing.assert_allclose(np.asarray(res_out), np.asarray(x + res), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(normed), _np_rms(np.asarray(x + res), w, 1e-5), rtol=1e-5, atol=1e-6
    )
    assert res_out.dtype == jnp.float32


def test_fused_add_norm_bf16_residual_dtype_policy():
    x = jnp.ones((2, 3, 8), jnp.bfloat16)
    res = jnp.ones((2, 3, 8), jnp.bfloat16)
    w = jnp.ones((8,), jnp.float32)
    normed, res_fp32 = fused_add_norm(
        x, w, residual=res, prenorm=True, residual_in_fp32=True
    )
    assert normed.dtype == jnp.bfloat16
    assert res_fp32.dtype == jnp.float32
    _, res_bf16 = fused_add_norm(x, w, residual=res, prenorm=True, residual_in_fp32=False)
    assert res_bf16.dtype == jnp.bfloat16


def test_fused_add_norm_postnorm_returns_single_tensor():
    x = jnp.ones((1, 2, 8), jnp.float32)
    w = jnp.ones((8,), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    out = fused_add_norm(x, w, b, residual=None, prenorm=False, norm_type="layer")
    assert isinstance(out, jax.Array)
    assert out.shape == x.shape
