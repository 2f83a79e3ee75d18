"""Model-level fast path (fused Pallas mixer) in interpret mode: the full
encoder with use_fast_path=True must match the composed XLA path, including
streaming and training gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import PretrainVideoMamba


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


def _model(fast, params=None):
    return PretrainVideoMamba(
        img_size=16, patch_size=8, depth=2, embed_dim=64, channels=3,
        ssm_cfg={"use_fast_path": fast}, fused_add_norm=True, rms_norm=True,
        residual_in_fp32=True, kernel_size=1, num_frames=4,
        add_pool_norm=False, rng=7, params=params,
    )


@pytest.mark.slow
def test_full_model_fast_path_matches_composed():
    slow = _model(False)
    fast = _model(True, params=slow.params)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 16, 16), jnp.float32)
    y_s = slow(x)
    y_f = fast(x)
    np.testing.assert_allclose(np.asarray(y_f), np.asarray(y_s), rtol=1e-4, atol=1e-4)


@pytest.mark.slow
def test_full_model_fast_path_streaming():
    fast = _model(True)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 16, 16), jnp.float32)
    full = fast(x)
    state = fast.allocate_state(1)
    c1, state = fast(x[:, :, :2], ssm_state=state, temporal_pos_offset=0)
    c2, _ = fast(x[:, :, 2:], ssm_state=state, temporal_pos_offset=2)
    stitched = jnp.concatenate([c1, c2], axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_full_model_fast_path_gradients():
    slow = _model(False)
    fast = _model(True, params=slow.params)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 16, 16), jnp.float32)

    def loss(model):
        def f(p):
            y = model.apply(p, x)
            return jnp.sum(y * y)
        return f

    g_s = jax.grad(loss(slow))(slow.params)
    g_f = jax.grad(loss(fast))(fast.params)
    for (kp, a), b in zip(
        jax.tree_util.tree_flatten_with_path(g_f)[0],
        jax.tree_util.tree_leaves(g_s),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-5,
            err_msg=f"grad mismatch at {jax.tree_util.keystr(kp)}",
        )
