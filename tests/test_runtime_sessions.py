"""Runtime sessions (StreamingSession / DecodeSession) over both mixers.

StreamingSession packages the reference's documented chunked-streaming
calling convention (/root/reference/README.md:92-127) as a stateful serving
object; DecodeSession compiles the whole layer stack into one lax.scan step.
These tests pin that both runtime objects work with the Mamba-1 mixer and
the Mamba-2 (SSD) mixer, since both expose the same step/state surface.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import PretrainVideoMamba
from videomamba_tpu.runtime import DecodeSession, StreamingSession


def _model(layer="Mamba1", **overrides):
    if layer == "Mamba2":
        ssm_cfg = {"layer": "Mamba2", "d_state": 32, "headdim": 24,
                   "chunk_size": 8}
        embed = 96
    else:
        ssm_cfg = {"use_fast_path": False, "d_state": 16}
        embed = 64
    kwargs = dict(
        img_size=32, patch_size=16, depth=2, embed_dim=embed, channels=3,
        ssm_cfg=ssm_cfg, fused_add_norm=False, rms_norm=False,
        residual_in_fp32=False, kernel_size=1, num_frames=8,
        pool_type="avg", add_pool_norm=False, rng=0,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


@pytest.mark.parametrize("layer", ["Mamba1", "Mamba2"])
def test_streaming_session_matches_full(layer):
    model = _model(layer)
    clip = jax.random.normal(
        jax.random.PRNGKey(1), (2, 3, 8, 32, 32), jnp.float32)
    full_vis = model(clip)  # add_pool_norm=False: returns x_vis only

    session = StreamingSession(model, batch_size=2)
    vis1 = session.process(clip[:, :, :4])
    vis2 = session.process(clip[:, :, 4:])
    assert session.offset == 8

    # chunk 0 carries the CLS token (reference CLS gating); continuation
    # chunks are patch-only, so the stitched sequence equals the full run.
    stitched = jnp.concatenate([vis1, vis2], axis=1)
    assert stitched.shape == full_vis.shape
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full_vis), rtol=2e-4, atol=2e-4)


def test_streaming_session_reset_rows():
    model = _model()
    clip = jax.random.normal(
        jax.random.PRNGKey(2), (2, 3, 4, 32, 32), jnp.float32)
    session = StreamingSession(model, batch_size=2)
    session.process(clip)
    # both rows have nonzero state after a chunk
    leaves = jax.tree_util.tree_leaves(session.state)
    assert any(bool(jnp.any(a[1] != 0)) for a in leaves)
    session.reset(rows=[0])
    for a in jax.tree_util.tree_leaves(session.state):
        assert bool(jnp.all(a[0] == 0))
    assert any(bool(jnp.any(a[1] != 0))
               for a in jax.tree_util.tree_leaves(session.state))


def _embed_all_tokens(model, x):
    """Patchify + pos + CLS exactly like forward_features' front end."""
    p = model.params
    tokens = model.patch_embed(p["patch_embed"], x)  # (B, T', HW, E)
    spatial = model._get_spatial_pos_embedding(2, 2, tokens.dtype)
    temporal = model._get_temporal_pos_embedding(tokens.shape[1], 0,
                                                 tokens.dtype)
    tokens = tokens + spatial[:, None] + temporal[:, :, None]
    tokens = tokens.reshape(tokens.shape[0], -1, model.embed_dim)
    cls_tok = jnp.broadcast_to(
        (p["cls_token"] + p["pos_embed"][:, :1]).astype(tokens.dtype),
        (tokens.shape[0], 1, model.embed_dim),
    )
    return jnp.concatenate([cls_tok, tokens], axis=1)


def test_decode_session_mamba2_matches_full():
    model = _model("Mamba2", depth=3)
    x = jax.random.normal(
        jax.random.PRNGKey(3), (2, 3, 4, 32, 32), jnp.float32)
    full = model.forward_features(x)

    tokens = _embed_all_tokens(model, x)
    session = DecodeSession(model, batch_size=2)
    feats = [session.step(tokens[:, t]) for t in range(tokens.shape[1])]
    decoded = jnp.stack(feats, axis=1)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(full), rtol=1e-4, atol=1e-4)
