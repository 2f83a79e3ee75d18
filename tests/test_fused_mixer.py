"""Fully-fused Pallas mixer (conv+proj+scan+gate) vs the composed path.

Runs in interpret mode; parity required on forward, streaming carry, and all
parameter/input gradients (the fused path has a composite custom VJP:
XLA-recomputed projections + the Pallas scan backward).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models.mamba import Mamba


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


@pytest.fixture(scope="module")
def setup():
    fused = Mamba(d_model=64, d_state=16, d_conv=4, expand=2, use_fast_path=True)
    composed = Mamba(d_model=64, d_state=16, d_conv=4, expand=2, use_fast_path=False)
    params = fused.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 64), jnp.float32)
    return fused, composed, params, x


def test_gate_is_active(setup):
    fused, _, params, _ = setup
    assert fused._use_fused_mixer(params)


def test_forward_matches_composed(setup):
    fused, composed, params, x = setup
    y_f = fused(params, x)
    y_x = composed(params, x)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_x), rtol=1e-5, atol=1e-5
    )


def test_streaming_chunked_equals_full(setup):
    fused, _, params, x = setup
    full = fused(params, x)
    state = fused.allocate_state(2)
    y1, st = fused(params, x[:, :9], state=state, return_state=True)
    y2, st2 = fused(params, x[:, 9:], state=st, return_state=True)
    stitched = jnp.concatenate([y1, y2], axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=1e-5, atol=1e-5
    )
    conv, ssm = st2
    assert conv.shape == (2, 128, 4) and ssm.shape == (2, 128, 16)
    assert conv.dtype == state[0].dtype and ssm.dtype == state[1].dtype


@pytest.mark.slow
def test_gradients_match_composed(setup):
    fused, composed, params, x = setup

    def loss(mixer):
        def f(p, x_):
            y1, st = mixer(p, x_[:, :9], return_state=True)
            y2, _ = mixer(p, x_[:, 9:], state=st, return_state=True)
            return jnp.sum(y1 * y1) + jnp.sum(y2 * y2)
        return f

    gp_f, gx_f = jax.grad(loss(fused), argnums=(0, 1))(params, x)
    gp_x, gx_x = jax.grad(loss(composed), argnums=(0, 1))(params, x)
    for (kp, a), b in zip(
        jax.tree_util.tree_flatten_with_path(gp_f)[0],
        jax.tree_util.tree_leaves(gp_x),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=f"param grad mismatch at {jax.tree_util.keystr(kp)}",
        )
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_x), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_unsupported_width_falls_back(setup):
    # d_inner = 2*24 = 48 not lane-aligned: gate must reject, path still works.
    mixer = Mamba(d_model=24, d_state=16, use_fast_path=True)
    params = mixer.init(jax.random.PRNGKey(2))
    assert not mixer._use_fused_mixer(params)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 24), jnp.float32)
    out = mixer(params, x)
    assert out.shape == x.shape
