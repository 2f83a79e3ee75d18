"""Pallas causal-conv kernel vs the XLA composition (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops.causal_conv1d import causal_conv1d


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


def _inputs(key, bsz=2, L=24, d=128, w=4):
    ks = jax.random.split(jax.random.PRNGKey(key), 4)
    x = jax.random.normal(ks[0], (bsz, L, d), jnp.float32)
    weight = jax.random.normal(ks[1], (w, d), jnp.float32)
    bias = jax.random.normal(ks[2], (d,), jnp.float32)
    state = 0.3 * jax.random.normal(ks[3], (bsz, d, w), jnp.float32)
    return x, weight, bias, state


def test_matches_xla_with_state():
    x, w, b, st = _inputs(0)
    y_x, s_x = causal_conv1d(x, w, b, initial_state=st, return_final_state=True)
    y_p, s_p = causal_conv1d(
        x, w, b, initial_state=st, return_final_state=True, use_pallas=True
    )
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-6, atol=1e-6)


def test_matches_xla_fresh_state_and_padding_tail():
    # L=19 not a multiple of the 8-row block granularity.
    x, w, b, _ = _inputs(1, L=19)
    y_x, s_x = causal_conv1d(x, w, b, return_final_state=True)
    y_p, s_p = causal_conv1d(x, w, b, return_final_state=True, use_pallas=True)
    np.testing.assert_allclose(np.asarray(y_p), np.asarray(y_x), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_p), np.asarray(s_x), rtol=1e-6, atol=1e-6)


def test_cross_block_context():
    """Context must carry across time blocks (block_l smaller than L)."""
    from videomamba_tpu.ops.pallas.causal_conv import causal_conv1d_pallas

    x, w, b, st = _inputs(2, L=64)
    y_ref = causal_conv1d(x, w, b, initial_state=st)
    y_blk = causal_conv1d_pallas(x, w, b, st, block_l=16)
    np.testing.assert_allclose(np.asarray(y_blk), np.asarray(y_ref), rtol=1e-5, atol=1e-6)


def test_unsupported_shape_falls_back():
    x, w, b, st = _inputs(3, d=48)  # not lane-aligned
    y = causal_conv1d(x, w, b, initial_state=st, use_pallas=True)
    y_ref = causal_conv1d(x, w, b, initial_state=st)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), rtol=1e-6)


def test_gradients_match_xla():
    x, w, b, st = _inputs(4, L=16)

    def loss(flag):
        def f(x_, w_, b_):
            y = causal_conv1d(x_, w_, b_, initial_state=st, use_pallas=flag)
            return jnp.sum(y * y)
        return f

    g_p = jax.grad(loss(True), argnums=(0, 1, 2))(x, w, b)
    g_x = jax.grad(loss(False), argnums=(0, 1, 2))(x, w, b)
    for gp, gx in zip(g_p, g_x):
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), rtol=1e-4, atol=1e-5)
