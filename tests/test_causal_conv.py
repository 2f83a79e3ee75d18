"""Causal depthwise conv: golden numerics, streaming carry, decode step."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops import causal_conv1d, causal_conv1d_update


def _numpy_causal_conv(x_bld, weight_wd, bias=None, state_bdw=None):
    """Raw (pre-activation) causal depthwise conv oracle in float64."""
    x = np.asarray(x_bld, dtype=np.float64)
    w = np.asarray(weight_wd, dtype=np.float64)
    bsz, L, d = x.shape
    W = w.shape[0]
    if state_bdw is not None:
        left = np.asarray(state_bdw, dtype=np.float64).transpose(0, 2, 1)[:, -(W - 1):]
    else:
        left = np.zeros((bsz, W - 1, d))
    ctx = np.concatenate([left, x], axis=1)
    y = np.zeros((bsz, L, d))
    for t in range(L):
        for k in range(W):
            y[:, t] += w[k] * ctx[:, t + k]
    if bias is not None:
        y += np.asarray(bias, dtype=np.float64)
    return y


def _silu(y):
    return y * (1.0 / (1.0 + np.exp(-y)))


@pytest.mark.slow
def test_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 9, 6), jnp.float32)
    w = jax.random.normal(ks[1], (4, 6), jnp.float32)
    b = jax.random.normal(ks[2], (6,), jnp.float32)
    got = causal_conv1d(x, w, b, activation="silu")
    want = _silu(_numpy_causal_conv(x, w, b))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_streaming_split_equals_full():
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 12, 6), jnp.float32)
    w = jax.random.normal(ks[1], (4, 6), jnp.float32)
    b = jax.random.normal(ks[2], (6,), jnp.float32)

    full = causal_conv1d(x, w, b)

    state0 = jnp.zeros((2, 6, 4), jnp.float32)
    y1, state1 = causal_conv1d(x[:, :5], w, b, initial_state=state0, return_final_state=True)
    y2, state2 = causal_conv1d(x[:, 5:], w, b, initial_state=state1, return_final_state=True)
    stitched = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(np.asarray(stitched), np.asarray(full), rtol=1e-5, atol=1e-6)
    # State holds the last W raw inputs.
    np.testing.assert_allclose(
        np.asarray(state2), np.asarray(x[:, -4:].swapaxes(1, 2)), rtol=1e-6, atol=1e-6
    )


def test_final_state_zero_padded_when_sequence_shorter_than_kernel():
    x = jnp.ones((1, 2, 3), jnp.float32)
    w = jnp.ones((4, 3), jnp.float32)
    _, state = causal_conv1d(x, w, None, return_final_state=True)
    want = np.zeros((1, 3, 4), np.float32)
    want[:, :, -2:] = 1.0
    np.testing.assert_allclose(np.asarray(state), want)


def test_update_step_matches_batch_path():
    """Feeding tokens one by one through causal_conv1d_update reproduces the
    batch conv (decode-path parity with the rolling-buffer CUDA kernel)."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 3)
    x = jax.random.normal(ks[0], (2, 6, 5), jnp.float32)
    w = jax.random.normal(ks[1], (4, 5), jnp.float32)
    b = jax.random.normal(ks[2], (5,), jnp.float32)

    full = causal_conv1d(x, w, b)

    state = jnp.zeros((2, 5, 4), jnp.float32)
    outs = []
    for t in range(6):
        y, state = causal_conv1d_update(x[:, t], state, w, b)
        outs.append(y)
    stepped = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(np.asarray(stepped), np.asarray(full), rtol=1e-5, atol=1e-6)
