"""Whole-stack SSD (Mamba-2) decode kernel vs the XLA lax.scan decode path.

Same architecture as the Mamba-1 whole-stack kernel (one pallas_call, grid
over layers) but with the SSD single-token update — the reference's
``selective_state_update`` role (mamba_simple.py:453-497) restricted to
scalar-per-head decay. Per-head (B, H) quantities are expanded to H*P lanes
with a one-hot matmul inside the kernel. Parity bar: fp32 near-exact vs the
XLA path, carried states exact, multi-step trajectories identical.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import PretrainVideoMamba
from videomamba_tpu.runtime import DecodeSession


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


def _model(**overrides):
    ssm_cfg = {"layer": "Mamba2", "d_state": 32, "headdim": 32,
               "chunk_size": 8}
    ssm_cfg.update(overrides.pop("ssm_cfg", {}))
    kwargs = dict(
        img_size=16, patch_size=8, depth=3, embed_dim=64, channels=3,
        num_frames=4, add_pool_norm=False, ssm_cfg=ssm_cfg, rng=0,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


def _sessions(model, batch_size=2):
    xla = DecodeSession(model, batch_size=batch_size, use_pallas=False)
    pal = DecodeSession(model, batch_size=batch_size, use_pallas=True)
    assert xla.backend == "xla" and pal.backend == "pallas"
    return xla, pal


def _ssm_to_kernel_layout(ssm):
    # (K, B, H, P, N) -> kernel layout (K, B, N, H*P)
    k, b, h, p, n = ssm.shape
    return ssm.reshape(k, b, h * p, n).swapaxes(2, 3)


def test_single_step_exact():
    model = _model()
    xla, pal = _sessions(model)
    tok = jax.random.normal(jax.random.PRNGKey(1), (2, 64), jnp.float32)
    fx = xla.step(tok)
    fp = pal.step(tok)
    np.testing.assert_allclose(np.asarray(fx), np.asarray(fp),
                               rtol=1e-5, atol=1e-5)


def test_trajectory_and_states_match():
    model = _model()
    xla, pal = _sessions(model)
    for i in range(5):
        tok = jax.random.normal(jax.random.PRNGKey(10 + i), (2, 64),
                                jnp.float32)
        fx = xla.step(tok)
        fp = pal.step(tok)
        np.testing.assert_allclose(np.asarray(fx), np.asarray(fp),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(pal.conv_states.swapaxes(2, 3)),
        np.asarray(xla.conv_states), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pal.ssm_states),
        np.asarray(_ssm_to_kernel_layout(xla.ssm_states)),
        rtol=1e-4, atol=1e-6)


def test_layer_norm_no_gated_rmsnorm_variant():
    model = _model(rms_norm=False, ssm_cfg={"rmsnorm": False})
    xla, pal = _sessions(model)
    tok = jax.random.normal(jax.random.PRNGKey(2), (2, 64), jnp.float32)
    np.testing.assert_allclose(np.asarray(xla.step(tok)),
                               np.asarray(pal.step(tok)),
                               rtol=1e-5, atol=1e-5)


def test_load_streaming_state_layout():
    """Prefill via the streaming path, then decode from the adopted state —
    both backends must continue identically."""
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 3, 4, 16, 16),
                          jnp.float32)
    _, state = model.forward_features(x, ssm_state=model.allocate_state(2))
    xla, pal = _sessions(model)
    xla.load_streaming_state(state)
    pal.load_streaming_state(state)
    tok = jax.random.normal(jax.random.PRNGKey(4), (2, 64), jnp.float32)
    np.testing.assert_allclose(np.asarray(xla.step(tok)),
                               np.asarray(pal.step(tok)),
                               rtol=1e-4, atol=1e-5)


def test_forced_unsupported_raises():
    # ngroups > 1 is outside the kernel's single-B/C-group contract.
    model = _model(ssm_cfg={"ngroups": 2, "d_state": 16})
    with pytest.raises(ValueError, match="decode kernel"):
        DecodeSession(model, batch_size=1, use_pallas=True)
    sess = DecodeSession(model, batch_size=1)  # auto falls back
    assert sess.backend == "xla"


def test_forced_unaligned_d_inner_raises():
    # embed 48 -> d_inner 96: not 128-lane aligned.
    model = _model(embed_dim=48, ssm_cfg={"headdim": 24})
    with pytest.raises(ValueError, match="decode kernel"):
        DecodeSession(model, batch_size=1, use_pallas=True)


def test_batch_sizes():
    model = _model()
    for bsz in (1, 3):
        xla, pal = _sessions(model, batch_size=bsz)
        tok = jax.random.normal(jax.random.PRNGKey(5), (bsz, 64),
                                jnp.float32)
        np.testing.assert_allclose(np.asarray(xla.step(tok)),
                                   np.asarray(pal.step(tok)),
                                   rtol=1e-5, atol=1e-5)


def test_decode_matches_full_forward():
    """Token-by-token Pallas decode reproduces the whole-clip forward."""
    model = _model()
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 4, 16, 16),
                          jnp.float32)
    full = model.forward_features(x)

    from tests.test_runtime_sessions import _embed_all_tokens

    tokens = _embed_all_tokens(model, x)
    pal = DecodeSession(model, batch_size=2, use_pallas=True)
    feats = [pal.step(tokens[:, t]) for t in range(tokens.shape[1])]
    decoded = jnp.stack(feats, axis=1)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(full), rtol=1e-4, atol=1e-4)
