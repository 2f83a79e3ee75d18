"""PretrainVideoMamba behavioral regressions.

Mirrors the reference suite (tests/test_videomamba_regressions.py) — but since
JAX runs everywhere, the half that the reference gates on CUDA runs here on
CPU too. Golden test: chunked streaming == full sequence (reference bar 1e-2;
we hold 1e-4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import PretrainVideoMamba
from videomamba_tpu.models.videomamba import build_videomamba


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


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def test_bimamba_false_is_rejected():
    with pytest.raises(NotImplementedError, match="bimamba=True"):
        _small_model(bimamba=False)


def test_forward_returns_backbone_outputs_only():
    model = _small_model()
    x = _rand(0, (1, 3, 4, 8, 8))
    x_vis, x_pool = model(x)
    assert x_vis.shape == (1, 4 * 2 * 2, model.embed_dim)
    assert x_pool.shape == (1, 1, model.embed_dim)


def test_forward_features_returns_tensor_without_state():
    model = _small_model()
    x = _rand(1, (1, 3, 4, 8, 8))
    x_vis = model.forward_features(x)
    assert isinstance(x_vis, jax.Array)
    assert x_vis.shape == (1, 1 + 4 * 2 * 2, model.embed_dim)


def test_forward_features_returns_state_when_requested():
    model = _small_model()
    x = _rand(2, (1, 3, 2, 8, 8))
    state = model.init_state(batch_size=1)
    x_vis, next_state = model.forward_features(
        x, ssm_state=state, temporal_pos_offset=0
    )
    assert x_vis.shape[0] == 1
    assert isinstance(next_state, list)
    assert len(next_state) == model.depth


def test_forward_without_pool_norm_returns_tensor_only():
    model = _small_model(add_pool_norm=False)
    x = _rand(3, (1, 3, 4, 8, 8))
    x_vis = model(x)
    assert isinstance(x_vis, jax.Array)
    assert x_vis.shape == (1, 1 + 4 * 2 * 2, model.embed_dim)


def test_no_weight_decay_includes_temporal_pos_embedding():
    model = _small_model()
    assert "temporal_pos_embedding" in model.no_weight_decay()


def test_forward_rejects_frame_count_not_divisible_by_tubelet():
    model = _small_model(kernel_size=2, num_frames=8)
    x = _rand(4, (1, 3, 5, 8, 8))
    with pytest.raises(ValueError, match="must be divisible by tubelet size"):
        model(x)
    with pytest.raises(ValueError, match="must be divisible by tubelet size"):
        model.forward_features(x)


def test_forward_rejects_wrong_rank():
    model = _small_model()
    with pytest.raises(ValueError, match=r"\[B, C, T, H, W\]"):
        model(_rand(5, (1, 3, 8, 8)))


class TestMasking:
    def test_masked_forward_with_strict_mask_shape(self):
        model = _small_model()
        x = _rand(6, (2, 3, 4, 8, 8))
        mask = np.zeros((2, 1 + 4 * 2 * 2), bool)
        x_vis, x_pool = model(x, mask=mask)
        assert x_vis.shape[0] == 2
        assert x_pool.shape[0] == 2

    def test_masked_forward_rejects_legacy_mask_shape(self):
        model = _small_model()
        x = _rand(7, (1, 3, 4, 8, 8))
        legacy_mask = np.zeros((1, 4 * 2 * 2), bool)
        with pytest.raises(ValueError, match="mask token length mismatch"):
            model(x, mask=legacy_mask)

    def test_masked_forward_rejects_masked_cls_token(self):
        model = _small_model()
        x = _rand(8, (1, 3, 4, 8, 8))
        mask = np.zeros((1, 1 + 4 * 2 * 2), bool)
        mask[:, 0] = True
        with pytest.raises(ValueError, match="CLS token visible"):
            model(x, mask=mask)

    def test_masked_forward_rejects_variable_visible_token_counts(self):
        model = _small_model()
        x = _rand(9, (2, 3, 4, 8, 8))
        mask = np.zeros((2, 1 + 4 * 2 * 2), bool)
        mask[0, 3:7] = True
        mask[1, 3:11] = True
        with pytest.raises(ValueError, match="same number of visible tokens"):
            model(x, mask=mask, use_image=True)

    def test_masked_forward_rejects_all_patch_tokens_for_avg_pool(self):
        model = _small_model(pool_type="cls+avg")
        x = _rand(10, (1, 3, 4, 8, 8))
        mask = np.ones((1, 1 + 4 * 2 * 2), bool)
        mask[:, 0] = False
        with pytest.raises(ValueError, match="at least one patch token visible"):
            model(x, mask=mask, keep_temporal=False)

    def test_masked_gather_selects_visible_tokens(self):
        """Masked run equals unmasked run restricted to visible positions at
        the input level (checks gather indices ordering)."""
        model = _small_model(add_pool_norm=False)
        x = _rand(11, (1, 3, 4, 8, 8))
        full = model.forward_features(x)
        mask = np.zeros((1, 1 + 16), bool)
        hidden_positions = [3, 7, 8]
        mask[:, hidden_positions] = True
        masked_out = model.forward_features(x, mask=mask)
        assert masked_out.shape == (1, 17 - 3, model.embed_dim)

    def test_use_image_mask_length_uses_post_tubelet_temporal_tokens(self):
        model = _small_model(kernel_size=2, num_frames=4)
        x = _rand(12, (1, 3, 4, 8, 8))
        temporal_tokens = 4 // 2
        mask = np.zeros((1, 1 + temporal_tokens * model.patch_embed.num_patches), bool)
        x_vis, x_pool = model(x, mask=mask, use_image=True)
        assert x_vis.shape == (
            1, temporal_tokens * model.patch_embed.num_patches, model.embed_dim
        )
        assert x_pool.shape == (1, 1, model.embed_dim)

    def test_masked_forward_supports_runtime_temporal_length_mismatch(self):
        model = _small_model(num_frames=8)
        x = _rand(13, (1, 3, 4, 8, 8))
        mask = np.zeros((1, 1 + 4 * 2 * 2), bool)
        x_vis, x_pool = model(x, mask=mask)
        assert x_vis.shape[0] == 1 and x_pool.shape[0] == 1


class TestKeepTemporal:
    def test_cls_cat_avg_concatenates_cls_and_temporal_avg(self):
        model_add = _small_model(pool_type="cls+avg")
        model_cat = _small_model(pool_type="cls_cat_avg", params=model_add.params)
        x = _rand(14, (1, 3, 4, 8, 8))
        temporal_tokens = 4

        _, pool_add = model_add(x, keep_temporal=True)
        _, pool_cat = model_cat(x, keep_temporal=True)
        assert pool_add.shape == (1, temporal_tokens, model_add.embed_dim)
        assert pool_cat.shape == (1, temporal_tokens + 1, model_cat.embed_dim)

    def test_masked_nonuniform_visible_per_frame(self):
        model = _small_model(pool_type="cls+avg")
        x = _rand(15, (2, 3, 4, 8, 8))
        mask = np.ones((2, 1 + 4 * 2 * 2), bool)
        visible_positions = [0, 1, 5, 6, 9, 13, 14, 15]
        mask[:, visible_positions] = False
        _, x_pool = model(x, mask=mask, keep_temporal=True)
        assert x_pool.shape == (2, 4, model.embed_dim)

    def test_masked_requires_visible_tokens_in_each_frame(self):
        model = _small_model(pool_type="cls+avg")
        x = _rand(16, (1, 3, 4, 8, 8))
        mask = np.ones((1, 1 + 4 * 2 * 2), bool)
        mask[:, [0, 1, 2]] = False
        with pytest.raises(ValueError, match="at least one visible patch token"):
            model(x, mask=mask, keep_temporal=True)

    def test_unmasked_keep_temporal_matches_manual_mean(self):
        model = _small_model(pool_type="avg")
        x = _rand(17, (1, 3, 4, 8, 8))
        x_vis, x_pool = model(x, keep_temporal=True)
        manual = np.asarray(x_vis).reshape(1, 4, 4, 16).mean(axis=2)
        from videomamba_tpu.ops.norm import layer_norm

        want = layer_norm(
            jnp.asarray(manual),
            model.params["pool_norm"]["weight"],
            model.params["pool_norm"]["bias"],
        )
        np.testing.assert_allclose(np.asarray(x_pool), np.asarray(want), rtol=1e-5, atol=1e-5)


class TestStreaming:
    def test_continuation_chunk_omits_cls_token_with_full_state(self):
        model = _small_model(add_pool_norm=False)
        x = _rand(18, (1, 3, 4, 8, 8))
        state = model.init_state(batch_size=1)
        first_chunk, state = model(x[:, :, :2], ssm_state=state, temporal_pos_offset=0)
        second_chunk, _ = model(x[:, :, 2:], ssm_state=state, temporal_pos_offset=2)
        assert first_chunk.shape[1] == 1 + 2 * 2 * 2
        assert second_chunk.shape[1] == 2 * 2 * 2

    @pytest.mark.parametrize("pool_type", ["cls+avg", "cls_cat_avg"])
    def test_streaming_rejects_cls_based_pooling_after_first_chunk(self, pool_type):
        model = _small_model(pool_type=pool_type)
        x = _rand(19, (1, 3, 2, 8, 8))
        state = model.init_state(batch_size=1)
        with pytest.raises(ValueError, match="requires a CLS token"):
            model(x, keep_temporal=True, ssm_state=state, temporal_pos_offset=1)

    @pytest.mark.slow
    def test_streaming_chunked_full_state_matches_full_sequence_features(self):
        model = _small_model(add_pool_norm=False, num_frames=8)
        x = _rand(20, (1, 3, 8, 8, 8))
        full = model(x)

        state = model.init_state(batch_size=1)
        first_chunk, state = model(x[:, :, :4], ssm_state=state, temporal_pos_offset=0)
        second_chunk, _ = model(x[:, :, 4:], ssm_state=state, temporal_pos_offset=4)
        stitched = jnp.concatenate([first_chunk, second_chunk], axis=1)
        np.testing.assert_allclose(
            np.asarray(stitched), np.asarray(full), rtol=1e-4, atol=1e-4
        )

    @pytest.mark.slow
    def test_streaming_four_chunks_beyond_trained_horizon(self):
        """Extrapolated temporal pos-embeds: stream 8 frames with a model
        trained for 4 — exercises the linear-resample path every chunk.

        Note (reference semantics, videomamba.py:655-675): a chunk whose end
        exceeds the trained horizon resamples the embedding to length
        offset+seqlen and slices, so the per-chunk embeddings differ from a
        single full-sequence run (which resamples once to the final length).
        Within the horizon the chunks must match the full run exactly.
        """
        model = _small_model(add_pool_norm=False, num_frames=4)
        model.params["temporal_pos_embedding"] = _rand(21, (1, 4, 16)) * 0.1
        x = _rand(22, (1, 3, 8, 8, 8))
        full = model(x)

        state = model.init_state(batch_size=1)
        chunks = []
        for s in range(0, 8, 2):
            out, state = model(
                x[:, :, s:s + 2], ssm_state=state, temporal_pos_offset=s
            )
            chunks.append(out)
        stitched = jnp.concatenate(chunks, axis=1)
        assert stitched.shape == full.shape
        assert bool(jnp.all(jnp.isfinite(stitched)))

        # The per-chunk temporal embedding matches the documented contract:
        # plain slice within horizon, resample-to-end beyond it.
        from videomamba_tpu.ops.resample import resample_linear_1d

        emb = model.params["temporal_pos_embedding"]
        within = model._get_temporal_pos_embedding(2, 2, jnp.float32)
        np.testing.assert_allclose(np.asarray(within), np.asarray(emb[:, 2:4]))
        beyond = model._get_temporal_pos_embedding(2, 6, jnp.float32)
        want = resample_linear_1d(emb, 8)[:, 6:8]
        np.testing.assert_allclose(
            np.asarray(beyond), np.asarray(want), rtol=1e-6, atol=1e-6
        )

    def test_streaming_dict_state_roundtrip(self):
        model = _small_model(add_pool_norm=False)
        x = _rand(23, (1, 3, 2, 8, 8))
        state = model.init_state(batch_size=1, as_dict=True)
        out, next_state = model(x, ssm_state=state, temporal_pos_offset=0)
        assert isinstance(next_state, dict)
        assert set(next_state.keys()) == {0, 1}

    def test_streaming_tuple_state_roundtrip(self):
        model = _small_model(add_pool_norm=False)
        x = _rand(24, (1, 3, 2, 8, 8))
        state = tuple(model.init_state(batch_size=1))
        out, next_state = model(x, ssm_state=state, temporal_pos_offset=0)
        assert isinstance(next_state, tuple)

    def test_ssm_only_state_advances(self):
        """SSM-only states (init_ssm_state) come back ADVANCED — the
        functional equivalent of the reference's in-place
        ``ssm_state.copy_(last_state)`` (mamba_simple.py:427-439): chunk 2
        must see the state chunk 1 produced, not the zeros it started from."""
        model = _small_model(add_pool_norm=False)
        x = _rand(25, (1, 3, 2, 8, 8))
        state = model.init_ssm_state(batch_size=1)
        out, next_state = model(x, ssm_state=state, temporal_pos_offset=0)
        assert isinstance(next_state, list) and len(next_state) == len(state)
        for s_new, s_old in zip(next_state, state):
            assert s_new.shape == s_old.shape and s_new.dtype == s_old.dtype
            assert not np.allclose(np.asarray(s_new), np.asarray(s_old))

    def test_ssm_only_streaming_carries_state(self):
        """Two ssm-only chunks differ from two independent (zero-state)
        chunks — proof the carried state is actually consumed — and the
        advanced state equals the full-state path's ssm component when the
        conv boundary cannot interfere (first chunk)."""
        model = _small_model(add_pool_norm=False)
        x = _rand(27, (1, 3, 4, 8, 8))
        c1, c2 = x[:, :, :2], x[:, :, 2:]

        s0 = model.init_ssm_state(batch_size=1)
        _, s1 = model(c1, ssm_state=s0, temporal_pos_offset=0)
        out_carried, _ = model(c2, ssm_state=s1, temporal_pos_offset=2)
        out_fresh, _ = model(
            c2, ssm_state=model.init_ssm_state(batch_size=1),
            temporal_pos_offset=2,
        )
        assert not np.allclose(
            np.asarray(out_carried), np.asarray(out_fresh), atol=1e-6
        )

        # First-chunk ssm advancement matches the full-state path exactly.
        full0 = model.init_state(batch_size=1)
        _, full1 = model(c1, ssm_state=full0, temporal_pos_offset=0)
        for (_, ssm_full), ssm_only in zip(full1, s1):
            np.testing.assert_allclose(
                np.asarray(ssm_full), np.asarray(ssm_only), rtol=1e-5, atol=1e-5
            )

    def test_ssm_only_dict_missing_layers_stay_stateless(self):
        """A dict state covering only some layers: covered layers advance,
        missing layers run stateless and stay absent (reference
        videomamba.py:591-600 + dict.get semantics)."""
        model = _small_model(add_pool_norm=False)
        x = _rand(28, (1, 3, 2, 8, 8))
        full = model.init_ssm_state(batch_size=1, as_dict=True)
        partial = {0: full[0]}
        out, next_state = model(x, ssm_state=partial, temporal_pos_offset=0)
        assert set(next_state.keys()) == {0}
        assert not np.allclose(np.asarray(next_state[0]), np.asarray(full[0]))

    def test_no_recompilation_across_continuation_chunks(self):
        model = _small_model(add_pool_norm=False, num_frames=4)
        x = _rand(26, (1, 3, 8, 8, 8))
        state = model.init_state(batch_size=1)
        _, state = model(x[:, :, :2], ssm_state=state, temporal_pos_offset=0)
        _, state = model(x[:, :, 2:4], ssm_state=state, temporal_pos_offset=2)
        n_compiled = len(model._jit_cache)
        sizes = [fn._cache_size() for fn in model._jit_cache.values()]
        for s in range(4, 8, 2):
            _, state = model(x[:, :, s:s + 2], ssm_state=state, temporal_pos_offset=s)
        assert len(model._jit_cache) == n_compiled
        assert [fn._cache_size() for fn in model._jit_cache.values()] == sizes


class TestRuntimeResolution:
    def test_non_square_resolution_with_spatial_pos_interpolation(self):
        model = _small_model(img_size=8)
        x = _rand(27, (1, 3, 4, 12, 8))
        x_vis, x_pool = model(x)
        assert x_vis.shape == (1, 4 * 3 * 2, model.embed_dim)
        assert x_pool.shape == (1, 1, model.embed_dim)

    def test_temporal_pos_offset_changes_outputs_when_nonzero_embedding(self):
        model = _small_model(num_frames=8, add_pool_norm=False)
        model.params["temporal_pos_embedding"] = _rand(28, (1, 8, 16))
        x = _rand(29, (1, 3, 4, 8, 8))
        out_a = model.forward_features(x, use_image=True, temporal_pos_offset=0)
        out_b = model.forward_features(x, use_image=True, temporal_pos_offset=2)
        assert not np.allclose(np.asarray(out_a), np.asarray(out_b))


class TestContractMetadata:
    def test_model_contract_metadata_and_forward_semantics(self):
        from videomamba_tpu import streaming

        model = _small_model(add_pool_norm=True)
        assert model.streaming_contract_version == streaming.STREAMING_CONTRACT_VERSION
        semantics = model.forward_return_semantics()
        assert semantics.without_state == "(x_vis, x_pool)"
        assert semantics.with_state == "(x_vis, x_pool, next_state)"

        no_pool = _small_model(add_pool_norm=False)
        s2 = no_pool.forward_return_semantics()
        assert s2.without_state == "x_vis"
        assert s2.with_state == "(x_vis, next_state)"

    def test_streaming_contract_allocate_and_validate(self):
        from videomamba_tpu import streaming

        model = _small_model()
        state = streaming.allocate_state(model, batch_size=2)
        streaming.validate_state(model, state, batch_size=2)
        shapes = streaming.expected_state_shapes(model, batch_size=2)
        assert len(shapes) == model.depth
        assert shapes[0].conv_state == (2, model.layers[0].mixer.d_inner, 4)
        assert shapes[0].ssm_state == (2, model.layers[0].mixer.d_inner, 8)

    def test_validate_state_rejects_wrong_shapes(self):
        from videomamba_tpu import streaming

        model = _small_model()
        state = streaming.allocate_state(model, batch_size=2)
        with pytest.raises(ValueError, match="conv_state shape mismatch"):
            bad = [(s[0][:, :, :2], s[1]) for s in state]
            streaming.validate_state(model, bad, batch_size=2)
        with pytest.raises(ValueError, match="State length mismatch"):
            streaming.validate_state(model, state[:1], batch_size=2)
        with pytest.raises(TypeError, match="2-tuple"):
            streaming.validate_state(model, [s[0] for s in state], batch_size=2)


class TestBuilder:
    def _cfg(self, tmp_path=None, **overrides):
        from types import SimpleNamespace

        d = dict(
            img_size=8, patch_size=4, depth=2, embed_dim=16, channels=3,
            drop_path_rate=0.0, ssm_cfg={"use_fast_path": False, "d_state": 8},
            norm_epsilon=1e-5, fused_add_norm=False, rms_norm=False,
            residual_in_fp32=False, bimamba=True, pool_type="cls+avg",
            kernel_size=1, num_frames=4, use_checkpoint=False,
            checkpoint_num=0, pretrained=None,
        )
        d.update(overrides)
        return SimpleNamespace(vision_encoder=SimpleNamespace(**d))

    def test_build_videomamba_basic(self):
        model = build_videomamba(self._cfg())
        assert isinstance(model, PretrainVideoMamba)

    def test_build_videomamba_requires_channels_attr(self):
        cfg = self._cfg()
        del cfg.vision_encoder.channels
        cfg.vision_encoder.in_chans = 3
        with pytest.raises(AttributeError):
            build_videomamba(cfg)
