"""Public-API stability suite (mirrors reference tests/test_public_api_contract.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import video_mamba
import videomamba_tpu
from models.videomamba import build_videomamba as legacy_build_videomamba
from videomamba_tpu.models import PretrainVideoMamba


def _small_model(**overrides):
    kwargs = dict(
        img_size=8,
        patch_size=4,
        depth=2,
        embed_dim=16,
        channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8},
        fused_add_norm=False,
        rms_norm=False,
        residual_in_fp32=False,
        kernel_size=1,
        num_frames=4,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


def test_top_level_alias_points_to_legacy_builder():
    assert video_mamba.build_videomamba is legacy_build_videomamba
    assert videomamba_tpu.build_videomamba is video_mamba.build_videomamba
    assert video_mamba.PretrainVideoMamba is videomamba_tpu.PretrainVideoMamba
    assert video_mamba.allocate_state is videomamba_tpu.allocate_state


def test_streaming_contract_allocate_and_validate():
    model = _small_model()
    batch_size = 2
    state = video_mamba.allocate_state(model, batch_size=batch_size, dtype=jnp.float32)
    video_mamba.validate_state(model, state, batch_size=batch_size)
    shapes = video_mamba.expected_state_shapes(model, batch_size=batch_size)
    assert len(shapes) == model.depth
    assert shapes[0].conv_state == (batch_size, model.layers[0].mixer.d_inner, 4)
    assert shapes[0].ssm_state == (batch_size, model.layers[0].mixer.d_inner, 8)


def test_model_contract_metadata_and_forward_semantics():
    model = _small_model(add_pool_norm=True)
    assert model.streaming_contract_version == video_mamba.STREAMING_CONTRACT_VERSION
    semantics = model.forward_return_semantics()
    assert semantics.without_state == "(x_vis, x_pool)"
    assert semantics.with_state == "(x_vis, x_pool, next_state)"

    no_pool_model = _small_model(add_pool_norm=False)
    s = no_pool_model.forward_return_semantics()
    assert s.without_state == "x_vis"
    assert s.with_state == "(x_vis, next_state)"


def test_configure_determinism_reseeds_rng():
    video_mamba.configure_determinism(seed=1234, deterministic=True)
    k1 = videomamba_tpu.next_rng_key()
    x1 = jax.random.normal(k1, (8,))
    video_mamba.configure_determinism(seed=1234, deterministic=True)
    k2 = videomamba_tpu.next_rng_key()
    x2 = jax.random.normal(k2, (8,))
    np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
    # Restore defaults for the rest of the suite.
    video_mamba.configure_determinism(seed=0, deterministic=False)


def test_minimal_streaming_forward_contract():
    """The reference's one CUDA-gated CI test — runs everywhere here."""
    model = _small_model(add_pool_norm=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 4, 8, 8), jnp.float32)
    state = video_mamba.allocate_state(model, batch_size=1, dtype=x.dtype)

    first_chunk, state = model(
        x[:, :, :2], mask=None, use_image=False, ssm_state=state,
        temporal_pos_offset=0,
    )
    second_chunk, next_state = model(
        x[:, :, 2:], mask=None, use_image=False, ssm_state=state,
        temporal_pos_offset=2,
    )
    video_mamba.validate_state(model, next_state, batch_size=1)
    assert first_chunk.shape == (1, 1 + 2 * 2 * 2, model.embed_dim)
    assert second_chunk.shape == (1, 2 * 2 * 2, model.embed_dim)
