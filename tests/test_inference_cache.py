"""Decode-cache (inference_params) path: prefill + step, cache resize,
step==batch equivalence — mirrors the reference's cache regressions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models.mamba import InferenceCache, Mamba


@pytest.fixture(scope="module")
def mixer_and_params():
    mixer = Mamba(d_model=8, d_state=4, d_conv=2, expand=2,
                  use_fast_path=False, layer_idx=0)
    return mixer, mixer.init(jax.random.PRNGKey(0))


def test_inference_cache_resizes_when_batch_size_changes(mixer_and_params):
    mixer, params = mixer_and_params
    cache = InferenceCache(seqlen_offset=0, key_value_memory_dict={})

    out_a = mixer(params, jax.random.normal(jax.random.PRNGKey(1), (2, 1, 8)),
                  inference_params=cache)
    cache.seqlen_offset = 1
    out_b = mixer(params, jax.random.normal(jax.random.PRNGKey(2), (1, 1, 8)),
                  inference_params=cache)

    conv_state, ssm_state = cache.key_value_memory_dict[0]
    assert out_a.shape == (2, 1, 8)
    assert out_b.shape == (1, 1, 8)
    assert conv_state.shape[0] == 1
    assert ssm_state.shape[0] == 1


@pytest.mark.slow
def test_prefill_then_steps_matches_batch_forward(mixer_and_params):
    """Prefill a prefix through the cache, decode the rest token-by-token;
    must equal one full batch forward."""
    mixer, params = mixer_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 7, 8), jnp.float32)
    full = mixer(params, x)

    cache = InferenceCache()
    out_prefill = mixer(params, x[:, :3], inference_params=cache)
    cache.seqlen_offset = 3
    outs = [out_prefill]
    for t in range(3, 7):
        outs.append(mixer(params, x[:, t:t + 1], inference_params=cache))
        cache.seqlen_offset += 1
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=1e-4, atol=1e-4
    )


def test_cache_requires_layer_idx():
    mixer = Mamba(d_model=8, d_state=4, d_conv=2, use_fast_path=False)
    params = mixer.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="layer_idx"):
        mixer(params, jnp.ones((1, 1, 8)), inference_params=InferenceCache())


def test_state_and_inference_params_mutually_exclusive(mixer_and_params):
    mixer, params = mixer_and_params
    state = mixer.allocate_state(1)
    with pytest.raises(ValueError, match="not supported with inference_params"):
        mixer(params, jnp.ones((1, 1, 8)), state=state,
              inference_params=InferenceCache())


def test_model_level_allocate_inference_cache():
    from videomamba_tpu.models import PretrainVideoMamba

    model = PretrainVideoMamba(
        img_size=8, patch_size=4, depth=2, embed_dim=16, channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8}, fused_add_norm=False,
        rms_norm=False, residual_in_fp32=False, kernel_size=1, num_frames=4,
    )
    cache = model.allocate_inference_cache(batch_size=2, max_seqlen=16)
    assert set(cache.keys()) == {0, 1}
    conv, ssm = cache[0]
    assert conv.shape == (2, 32, 4)
    assert ssm.shape == (2, 32, 8)
