"""Mamba mixer: chunked-vs-full streaming parity (the reference's golden
layer-level check, scripts/check_streaming_state.py at 1e-4), state handling,
decode-step equivalence, gradient flow."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models.block import Block, create_block
from videomamba_tpu.models.mamba import Mamba


@pytest.fixture(scope="module")
def mixer_and_params():
    mixer = Mamba(d_model=16, d_state=8, d_conv=4, expand=2, use_fast_path=False)
    params = mixer.init(jax.random.PRNGKey(0))
    return mixer, params


@pytest.mark.slow
def test_chunked_equals_full_layer_level(mixer_and_params):
    mixer, params = mixer_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 16), jnp.float32)
    split = 5

    out_full = mixer(params, x)

    out1, state = mixer(params, x[:, :split], return_state=True)
    out2, _ = mixer(params, x[:, split:], state=state, return_state=True)
    stitched = jnp.concatenate([out1, out2], axis=1)

    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(out_full), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_three_way_chunking_with_allocated_state(mixer_and_params):
    mixer, params = mixer_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 15, 16), jnp.float32)
    out_full = mixer(params, x)

    state = mixer.allocate_state(batch_size=1)
    outs = []
    for s in range(0, 15, 5):
        y, state = mixer(params, x[:, s:s + 5], state=state, return_state=True)
        outs.append(y)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(out_full), rtol=1e-4, atol=1e-4
    )


def test_state_shapes_and_dtypes(mixer_and_params):
    mixer, params = mixer_and_params
    conv_state, ssm_state = mixer.allocate_state(batch_size=3)
    assert conv_state.shape == (3, 32, 4)
    assert ssm_state.shape == (3, 32, 8)
    assert conv_state.dtype == jnp.float32

    # Returned state keeps the incoming dtypes (jit-stable pytree).
    x = jnp.ones((3, 4, 16), jnp.float32)
    _, (c2, s2) = mixer(params, x, state=(conv_state, ssm_state), return_state=True)
    assert c2.shape == conv_state.shape and c2.dtype == conv_state.dtype
    assert s2.shape == ssm_state.shape and s2.dtype == ssm_state.dtype


def test_state_and_ssm_state_mutually_exclusive(mixer_and_params):
    mixer, params = mixer_and_params
    x = jnp.ones((1, 2, 16), jnp.float32)
    conv, ssm = mixer.allocate_state(1)
    with pytest.raises(ValueError, match="either state or ssm_state"):
        mixer(params, x, state=(conv, ssm), ssm_state=ssm)


def test_ssm_state_only_path(mixer_and_params):
    """ssm_state without conv context: scan starts from the given state but
    the conv sees zero left-context (reference mamba_simple.py:287,313-314)."""
    mixer, params = mixer_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 6, 16), jnp.float32)
    ssm0 = jnp.zeros((1, 32, 8), jnp.float32)
    out_a = mixer(params, x, ssm_state=ssm0)
    out_b = mixer(params, x)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_decode_step_matches_batch_forward(mixer_and_params):
    mixer, params = mixer_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 5, 16), jnp.float32)
    out_full = mixer(params, x)

    conv_state, ssm_state = mixer.allocate_state(batch_size=2)
    outs = []
    for t in range(5):
        y, conv_state, ssm_state = mixer.step(
            params, x[:, t:t + 1], conv_state, ssm_state
        )
        outs.append(y)
    stepped = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stepped), np.asarray(out_full), rtol=1e-4, atol=1e-4
    )


@pytest.mark.slow
def test_gradients_flow_through_streaming_path(mixer_and_params):
    mixer, params = mixer_and_params

    def loss(x):
        out1, state = mixer(params, x[:, :3], return_state=True)
        out2, _ = mixer(params, x[:, 3:], state=state, return_state=True)
        return jnp.sum(out1) + jnp.sum(out2)

    x = jax.random.normal(jax.random.PRNGKey(5), (1, 8, 16), jnp.float32)
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).sum()) > 0


def test_jit_no_recompile_across_chunks(mixer_and_params):
    mixer, params = mixer_and_params

    @jax.jit
    def chunk_fn(params, x, state):
        return mixer(params, x, state=state, return_state=True)

    x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 16), jnp.float32)
    state = mixer.allocate_state(1)
    _, state = chunk_fn(params, x, state)
    compiles_before = chunk_fn._cache_size()
    for _ in range(3):
        _, state = chunk_fn(params, x, state)
    assert chunk_fn._cache_size() == compiles_before


def test_env_kill_switch_disables_fast_path(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_DISABLE_FUSED", "1")
    mixer = Mamba(d_model=8, use_fast_path=True)
    assert mixer.use_fast_path is False
    monkeypatch.setenv("VIDEOMAMBA_DISABLE_FUSED", "")
    mixer = Mamba(d_model=8, use_fast_path=True)
    assert mixer.use_fast_path is True


class TestBlock:
    def _block(self, **kw):
        defaults = dict(
            d_model=16,
            ssm_cfg={"use_fast_path": False, "d_state": 8},
            rms_norm=False,
            fused_add_norm=False,
            residual_in_fp32=False,
            layer_idx=0,
        )
        defaults.update(kw)
        return create_block(**defaults)

    def test_return_state_arity(self):
        block = self._block()
        params = block.init(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 16), jnp.float32)
        state = block.mixer.allocate_state(batch_size=2)

        out_without = block(params, x, state=state, return_state=False)
        out_with = block(params, x, state=state, return_state=True)
        assert len(out_without) == 2
        assert len(out_with) == 3

    @pytest.mark.slow
    def test_block_chunked_equals_full(self):
        block = self._block(rms_norm=True, fused_add_norm=True, residual_in_fp32=True)
        params = block.init(jax.random.PRNGKey(2))
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 10, 16), jnp.float32)
        res = jax.random.normal(jax.random.PRNGKey(4), (1, 10, 16), jnp.float32)

        h_full, r_full = block(params, x, residual=res)

        state = block.mixer.allocate_state(1)
        h1, r1, state = block(
            params, x[:, :4], residual=res[:, :4], state=state, return_state=True
        )
        h2, r2, _ = block(
            params, x[:, 4:], residual=res[:, 4:], state=state, return_state=True
        )
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate([h1, h2], axis=1)),
            np.asarray(h_full),
            rtol=1e-4,
            atol=1e-4,
        )

    def test_mixer_forced_unidirectional(self):
        block = self._block()
        assert block.mixer.bimamba is False
