"""Activation recomputation (use_checkpoint) and bf16 serving parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import PretrainVideoMamba
from videomamba_tpu.utils.precision import cast_params_for_compute


def _model(**overrides):
    kwargs = dict(
        img_size=8, patch_size=4, depth=2, embed_dim=16, channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8}, fused_add_norm=False,
        rms_norm=False, residual_in_fp32=False, kernel_size=1, num_frames=4,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


def test_checkpointed_forward_matches_plain():
    plain = _model(rng=3)
    remat = _model(use_checkpoint=True, checkpoint_num=2, params=plain.params)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 8, 8), jnp.float32)
    y_p, p_p = plain(x)
    y_r, p_r = remat(x)
    np.testing.assert_allclose(np.asarray(y_r), np.asarray(y_p), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p_r), np.asarray(p_p), rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_checkpointed_gradients_match_plain():
    plain = _model(rng=4)
    remat = _model(use_checkpoint=True, checkpoint_num=1, params=plain.params)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 8, 8), jnp.float32)

    def loss(model):
        def f(p):
            y = model.apply(p, x)[0]
            return jnp.sum(y * y)
        return f

    g_p = jax.grad(loss(plain))(plain.params)
    g_r = jax.grad(loss(remat))(remat.params)
    for a, b in zip(jax.tree_util.tree_leaves(g_r), jax.tree_util.tree_leaves(g_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_bf16_model_matches_fp32_within_parity_bar():
    """bf16 serving preset vs fp32: <=1e-2 max-rel on features (the driver's
    1e-3 bar applies to mean-scale errors; max-rel over a tiny random model
    is looser — this guards against systematic precision bugs)."""
    fp32 = _model(rng=5, fused_add_norm=True, rms_norm=True, residual_in_fp32=True)
    bf16_params = cast_params_for_compute(fp32.params, jnp.bfloat16)
    bf16 = _model(
        rng=5, fused_add_norm=True, rms_norm=True, residual_in_fp32=True,
        params=bf16_params, dtype=jnp.bfloat16,
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 8, 8), jnp.float32)
    y32 = fp32(x)[0].astype(jnp.float32)
    y16 = bf16(x.astype(jnp.bfloat16))[0].astype(jnp.float32)
    rel = float(jnp.max(jnp.abs(y16 - y32)) / jnp.max(jnp.abs(y32)))
    assert rel < 1e-2, rel


@pytest.mark.slow
def test_bf16_streaming_state_stays_fp32():
    model = _model(rng=6, dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 2, 8, 8), jnp.bfloat16)
    state = model.allocate_state(1)  # default fp32 state
    assert state[0][1].dtype == jnp.float32
    _, _, next_state = model(x, ssm_state=state, temporal_pos_offset=0)
    assert next_state[0][1].dtype == jnp.float32  # jit-stable dtype carry
