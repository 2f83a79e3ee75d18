"""Whole-stack Pallas decode kernel vs the XLA lax.scan decode path.

The kernel (ops/pallas/decode_step.py) fuses all layers of one token step —
add-norm, in_proj, rolling conv, packed x/dt projections, single-token state
update (the reference's selective_state_update role,
mamba_simple.py:453-497), gate, out_proj — into one pallas_call with the
grid over layers. Parity bar: fp32 exact (same dot rounding), carried
states exact, multi-step trajectories identical.
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
    kwargs = dict(
        img_size=16, patch_size=8, depth=3, embed_dim=64, channels=3,
        num_frames=4, add_pool_norm=False, rng=0,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


def _sessions(model, batch_size=2):
    xla = DecodeSession(model, batch_size=batch_size, use_pallas=False)
    pal = DecodeSession(model, batch_size=batch_size, use_pallas=True)
    assert xla.backend == "xla" and pal.backend == "pallas"
    return xla, pal


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
        np.asarray(pal.ssm_states.swapaxes(2, 3)),
        np.asarray(xla.ssm_states), rtol=1e-4, atol=1e-6)


def test_layer_norm_variant():
    model = _model(rms_norm=False)
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
    # A projection bias makes the kernel ineligible; forcing must raise.
    model = _model(ssm_cfg={"bias": True})
    with pytest.raises(ValueError, match="decode kernel"):
        DecodeSession(model, batch_size=1, use_pallas=True)
    sess = DecodeSession(model, batch_size=1)  # auto falls back
    assert sess.backend == "xla"


def test_batch_sizes():
    model = _model()
    for bsz in (1, 3):
        xla, pal = _sessions(model, batch_size=bsz)
        tok = jax.random.normal(jax.random.PRNGKey(5), (bsz, 64),
                                jnp.float32)
        np.testing.assert_allclose(np.asarray(xla.step(tok)),
                                   np.asarray(pal.step(tok)),
                                   rtol=1e-5, atol=1e-5)
