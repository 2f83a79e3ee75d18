"""DecodeSession: compiled whole-stack token decode == full-sequence forward."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import PretrainVideoMamba
from videomamba_tpu.runtime import DecodeSession


def _model(**overrides):
    kwargs = dict(
        img_size=8, patch_size=4, depth=3, embed_dim=16, channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8}, fused_add_norm=False,
        rms_norm=False, residual_in_fp32=False, kernel_size=1, num_frames=4,
        add_pool_norm=False,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


def _embed_tokens(model, x):
    """Patchify + pos-add + CLS exactly like forward_features' front end."""
    p = model.params
    tokens = model.patch_embed(p["patch_embed"], x)  # (B, T', HW, E)
    spatial = model._get_spatial_pos_embedding(2, 2, tokens.dtype)
    temporal = model._get_temporal_pos_embedding(
        tokens.shape[1], 0, tokens.dtype
    )
    tokens = tokens + spatial[:, None] + temporal[:, :, None]
    tokens = tokens.reshape(tokens.shape[0], -1, model.embed_dim)
    cls_tok = jnp.broadcast_to(
        (p["cls_token"] + p["pos_embed"][:, :1]).astype(tokens.dtype),
        (tokens.shape[0], 1, model.embed_dim),
    )
    return jnp.concatenate([cls_tok, tokens], axis=1)


def test_token_decode_matches_full_forward():
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 8, 8), jnp.float32)
    full = model.forward_features(x)  # (B, 1+16, E)

    tokens = _embed_tokens(model, x)
    session = DecodeSession(model, batch_size=2)
    feats = []
    for t in range(tokens.shape[1]):
        feats.append(session.step(tokens[:, t]))
    decoded = jnp.stack(feats, axis=1)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(full), rtol=1e-4, atol=1e-4
    )


def test_prefill_then_decode_matches_full_forward():
    """Streaming-chunk prefill, adopt the state, continue token-by-token."""
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 4, 8, 8), jnp.float32)
    full = model.forward_features(x)

    # Prefill the first 2 frames through the chunked path.
    state = model.allocate_state(1)
    _, state = model.forward_features(
        x[:, :, :2], ssm_state=state, temporal_pos_offset=0
    )

    session = DecodeSession(model, batch_size=1)
    session.load_streaming_state(state)

    # Decode the remaining 2 frames' tokens (no CLS on continuation).
    p = model.params
    tok = model.patch_embed(p["patch_embed"], x[:, :, 2:])
    spatial = model._get_spatial_pos_embedding(2, 2, tok.dtype)
    temporal = model._get_temporal_pos_embedding(2, 2, tok.dtype)
    tok = (tok + spatial[:, None] + temporal[:, :, None]).reshape(1, -1, 16)

    feats = [session.step(tok[:, t]) for t in range(tok.shape[1])]
    decoded = jnp.stack(feats, axis=1)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(full[:, -8:]), rtol=1e-4, atol=1e-4
    )


def test_single_compilation_across_steps():
    model = _model()
    session = DecodeSession(model, batch_size=1)
    tok = jax.random.normal(jax.random.PRNGKey(2), (1, 16), jnp.float32)
    session.step(tok)
    n = session._step._cache_size()
    for _ in range(3):
        session.step(tok)
    assert session._step._cache_size() == n == 1
