"""Mamba2 (SSD) mixer + model integration: layer parity fast/slow, streaming,
decode, gradients, Block/model composition, streaming-contract validation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from videomamba_tpu.models.mamba2 import Mamba2


def _mixer(**kw):
    cfg = dict(d_model=96, d_state=32, headdim=24, ngroups=2, chunk_size=16,
               layer_idx=0)
    cfg.update(kw)
    return Mamba2(**cfg)


def _params_and_input(m, seed=0, bsz=2, seqlen=21):
    p = m.init(jax.random.PRNGKey(seed))
    x = jax.random.normal(jax.random.PRNGKey(seed + 1),
                          (bsz, seqlen, m.d_model), jnp.float32)
    return p, x


def test_shapes_and_param_tree():
    m = _mixer()
    p, x = _params_and_input(m)
    assert m.d_inner == 192 and m.nheads == 8 and m.conv_dim == 192 + 128
    assert p["in_proj"]["kernel"].shape == (96, m.d_in_proj)
    assert p["A_log"].shape == (8,) and p["dt_bias"].shape == (8,)
    y = m(p, x)
    assert y.shape == x.shape and y.dtype == x.dtype


def test_fast_path_matches_oracle_path():
    m = _mixer()
    p, x = _params_and_input(m)
    y_fast = m(p, x)
    y_slow = _mixer(use_fast_path=False)(p, x)
    np.testing.assert_allclose(np.asarray(y_fast), np.asarray(y_slow),
                               rtol=1e-5, atol=1e-5)


def test_streaming_chunks_equal_full():
    m = _mixer()
    p, x = _params_and_input(m, seqlen=24)
    full, (conv_f, ssm_f) = m(p, x, state=m.allocate_state(2),
                              return_state=True)
    st = m.allocate_state(2)
    y1, st = m(p, x[:, :7], state=st, return_state=True)
    y2, st = m(p, x[:, 7:], state=st, return_state=True)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(full),
        rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st[0]), np.asarray(conv_f),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st[1]), np.asarray(ssm_f),
                               rtol=1e-5, atol=1e-5)


def test_ssm_only_path_returns_advanced_state():
    m = _mixer()
    p, x = _params_and_input(m)
    _, ssm0 = m.allocate_state(2)
    y, ssm1 = m(p, x, ssm_state=ssm0, return_ssm_state=True)
    assert ssm1.shape == ssm0.shape and ssm1.dtype == jnp.float32
    assert not bool(jnp.allclose(ssm1, ssm0))
    # feeding the advanced state changes the next chunk (state is consumed)
    y2a, _ = m(p, x, ssm_state=ssm0, return_ssm_state=True)
    y2b, _ = m(p, x, ssm_state=ssm1, return_ssm_state=True)
    assert not bool(jnp.allclose(y2a, y2b))


def test_decode_steps_match_full_forward():
    m = _mixer()
    p, x = _params_and_input(m, seqlen=6)
    full = m(p, x)
    cs, ss = m.allocate_state(2)
    outs = []
    for t in range(6):
        o, cs, ss = m.step(p, x[:, t:t + 1], cs, ss)
        outs.append(o)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, 1)),
                               np.asarray(full), rtol=1e-5, atol=1e-5)


def test_inference_cache_prefill_then_decode():
    from videomamba_tpu.models.mamba import InferenceCache

    m = _mixer()
    p, x = _params_and_input(m, seqlen=8)
    full = m(p, x)
    cache = InferenceCache()
    out_pre = m(p, x[:, :5], inference_params=cache)
    np.testing.assert_allclose(np.asarray(out_pre), np.asarray(full[:, :5]),
                               rtol=1e-5, atol=1e-5)
    cache.seqlen_offset = 5
    outs = [out_pre]
    for t in range(5, 8):
        outs.append(m(p, x[:, t:t + 1], inference_params=cache))
        cache.seqlen_offset += 1
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate(outs, 1)), np.asarray(full),
        rtol=1e-5, atol=1e-5)


def test_gradients_finite_and_paths_agree():
    m = _mixer()
    m_slow = _mixer(use_fast_path=False)
    p, x = _params_and_input(m)

    def loss(mm):
        return lambda pp: jnp.sum(mm(pp, x) ** 2)

    gf = jax.grad(loss(m))(p)
    gs = jax.grad(loss(m_slow))(p)
    flat_f, tree_f = jax.tree_util.tree_flatten(gf)
    flat_s, _ = jax.tree_util.tree_flatten(gs)
    for a, b in zip(flat_f, flat_s):
        assert bool(jnp.isfinite(a).all())
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_bf16_forward_tracks_fp32():
    m = _mixer()
    p, x = _params_and_input(m, seqlen=24)
    p_bf = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 and a.ndim >= 2
        else a, p)
    y32 = m(p, x)
    y16 = m(p_bf, x.astype(jnp.bfloat16))
    assert y16.dtype == jnp.bfloat16
    rel = float(jnp.abs(y16.astype(jnp.float32) - y32).max()
                / (jnp.abs(y32).max() + 1e-6))
    assert rel < 0.06, rel


def test_validation_errors():
    with pytest.raises(ValueError):
        Mamba2(d_model=100, headdim=24)  # d_inner=200 not multiple of 24
    with pytest.raises(ValueError):
        Mamba2(d_model=96, headdim=24, ngroups=3)  # 8 heads, 3 groups
    m = _mixer()
    p, x = _params_and_input(m)
    with pytest.raises(ValueError):
        m(p, x, state=m.allocate_state(2), ssm_state=m.allocate_state(2)[1])


# ------------------------------------------------------------- model level


def _model(**kw):
    from videomamba_tpu.models.videomamba import PretrainVideoMamba

    cfg = dict(img_size=32, patch_size=16, depth=2, embed_dim=96,
               num_frames=4, kernel_size=1,
               ssm_cfg={"layer": "Mamba2", "d_state": 32, "headdim": 24},
               rng=0)
    cfg.update(kw)
    return PretrainVideoMamba(**cfg)


def test_model_forward_and_contract():
    from videomamba_tpu import streaming

    model = _model()
    clip = jax.random.normal(jax.random.PRNGKey(2), (1, 3, 4, 32, 32),
                             jnp.float32)
    x_vis, x_pool = model(clip)
    assert x_vis.shape[0] == 1 and x_pool.shape == (1, 1, 96)
    st = streaming.allocate_state(model, batch_size=1)
    streaming.validate_state(model, st, batch_size=1)  # 4-D ssm accepted
    shapes = streaming.expected_state_shapes(model, batch_size=1)
    assert shapes[0].ssm_state == (1, 8, 24, 32)
    assert shapes[0].conv_state == (1, 256, 4)  # d_inner 192 + 2*1*32


def test_model_streaming_matches_full():
    model = _model()
    from videomamba_tpu import streaming

    clip = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 32, 32),
                             jnp.float32)
    st0 = streaming.allocate_state(model, batch_size=1)
    full, _ = model.forward_features(clip, ssm_state=st0)
    o1, st1 = model.forward_features(clip[:, :, :4], ssm_state=st0)
    o2, _ = model.forward_features(clip[:, :, 4:], ssm_state=st1,
                                   temporal_pos_offset=2)
    np.testing.assert_allclose(
        np.asarray(o2), np.asarray(full[:, -o2.shape[1]:]),
        rtol=1e-4, atol=1e-4)


def test_model_ssm_only_streaming_advances():
    model = _model()
    clip = jax.random.normal(jax.random.PRNGKey(4), (1, 3, 4, 32, 32),
                             jnp.float32)
    ssm0 = model.init_ssm_state(1)
    _, ssm1 = model.forward_features(clip, ssm_state=ssm0)
    changed = [
        not bool(jnp.allclose(a, b))
        for a, b in zip(jax.tree_util.tree_leaves(ssm0),
                        jax.tree_util.tree_leaves(ssm1))
    ]
    assert all(changed)


def test_model_gradients_finite():
    model = _model()
    clip = jax.random.normal(jax.random.PRNGKey(5), (2, 3, 4, 32, 32),
                             jnp.float32)

    def loss(p):
        x_vis, _ = model.forward(clip, params=p)
        return jnp.sum(x_vis ** 2)

    g = jax.grad(loss)(model.params)
    assert all(bool(jnp.isfinite(a).all())
               for a in jax.tree_util.tree_leaves(g))


def test_streaming_state_dtype_is_jit_stable():
    """A bf16 forward must hand back the state in the dtype it was allocated
    with (jit-stable pytree across chunks — same policy as Mamba-1), so a
    lax.scan/fori_loop over chunks type-checks."""
    model = _model(dtype=jnp.bfloat16)
    clip = jax.random.normal(jax.random.PRNGKey(6), (1, 3, 4, 32, 32),
                             jnp.bfloat16)
    st0 = model.allocate_state(1)  # default: f32 conv, f32 ssm
    _, st1 = model.forward_features(clip, ssm_state=st0,
                                    temporal_pos_offset=0)
    for a, b in zip(jax.tree_util.tree_leaves(st0),
                    jax.tree_util.tree_leaves(st1)):
        assert a.dtype == b.dtype and a.shape == b.shape


def test_create_block_rejects_unknown_layer():
    from videomamba_tpu.models.block import create_block

    with pytest.raises(ValueError):
        create_block(96, ssm_cfg={"layer": "Hyena"})


def test_m2_presets_first_class():
    """Users construct the SSD family without hand-building ssm_cfg
    (round-4 verdict item 2). The presets pin the measured-best v5e config
    and accept partial ssm_cfg overrides."""
    from videomamba_tpu.models.presets import M2_SSM_CFG, videomamba_tiny_m2
    from videomamba_tpu.models.mamba2 import Mamba2

    model = videomamba_tiny_m2(
        img_size=32, patch_size=8, num_frames=4, depth=2, rng=0,
        pool_type="avg", add_pool_norm=False)
    mixer = model.layers[0].mixer
    assert isinstance(mixer, Mamba2)
    assert mixer.d_state == M2_SSM_CFG["d_state"] == 64
    assert mixer.headdim == M2_SSM_CFG["headdim"] == 64
    assert mixer.chunk_size == M2_SSM_CFG["chunk_size"] == 128

    clip = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 4, 32, 32),
                             jnp.float32)
    out, _ = model.forward_features(clip,
                                    ssm_state=model.allocate_state(1))
    assert np.isfinite(np.asarray(out)).all()

    # Partial override merges over the pinned defaults.
    m = videomamba_tiny_m2(
        img_size=32, patch_size=8, num_frames=4, depth=2, rng=0,
        ssm_cfg={"d_state": 32, "headdim": 24})
    assert m.layers[0].mixer.d_state == 32
    assert m.layers[0].mixer.headdim == 24
    assert m.layers[0].mixer.chunk_size == 128  # default retained
