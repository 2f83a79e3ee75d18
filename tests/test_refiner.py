"""BiMambaRefinerBlock: shapes, gating, streaming forward state."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models.refiner import BiMambaRefinerBlock


@pytest.fixture(scope="module")
def refiner_and_params():
    r = BiMambaRefinerBlock(
        dim=16,
        ssm_cfg={"use_fast_path": False, "d_state": 8},
        rms_norm=False,
        fused_add_norm=False,
        residual_in_fp32=False,
        layer_idx=0,
    )
    return r, r.init(jax.random.PRNGKey(0))


@pytest.mark.slow
def test_sequence_input_shape(refiner_and_params):
    r, params = refiner_and_params
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 6, 16), jnp.float32)
    out, state_fwd = r(params, x)
    assert out.shape == x.shape
    conv, ssm = state_fwd
    assert conv.shape == (2, 32, 4)
    assert ssm.shape == (2, 32, 8)


@pytest.mark.slow
def test_packed_input_shape(refiner_and_params):
    r, params = refiner_and_params
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 3, 4, 16), jnp.float32)
    out, _ = r(params, x)
    assert out.shape == x.shape


def test_flip_time_packed_flips_frames_not_tokens():
    x = jnp.arange(2 * 3 * 2 * 1, dtype=jnp.float32).reshape(2, 3 * 2, 1)
    flipped = BiMambaRefinerBlock._flip_time(x, (2, 3, 2))
    want = np.asarray(x).reshape(2, 3, 2, 1)[:, ::-1].reshape(2, 6, 1)
    np.testing.assert_array_equal(np.asarray(flipped), want)


def test_forward_state_streams_backward_state_does_not(refiner_and_params):
    """The fwd state advances across calls; bwd always re-initializes, so two
    calls with the same input but different bwd_init must differ only via the
    explicitly passed bwd state."""
    r, params = refiner_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 16), jnp.float32)
    out1, state_fwd = r(params, x)
    out2, state_fwd2 = r(params, x, state_fwd=state_fwd)
    # Carried fwd state changes the result.
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # Invalid ndim rejected.
    with pytest.raises(ValueError, match=r"\[B, L, C\] or \[B, T, N, C\]"):
        r(params, x[:, :, None, None, :])


def test_gate_blends_directions(refiner_and_params):
    """Saturating the gate bias collapses the blend to the forward branch."""
    r, params = refiner_and_params
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 4, 16), jnp.float32)

    params_fwd_only = jax.tree_util.tree_map(lambda v: v, params)
    params_fwd_only["fusion_gate"]["bias"] = jnp.full((16,), 100.0, jnp.float32)
    out_gated, _ = r(params_fwd_only, x)

    state = r.block_fwd.mixer.allocate_state(1, dtype=x.dtype)
    out_fwd, _, _ = r.block_fwd(params["block_fwd"], x, state=state, return_state=True)
    want = out_fwd @ params["out_proj"]["kernel"] + params["out_proj"]["bias"]
    np.testing.assert_allclose(
        np.asarray(out_gated), np.asarray(want), rtol=1e-5, atol=1e-5
    )
