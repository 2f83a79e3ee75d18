"""Selective-scan numerics: chunked vs oracle, state carry, NumPy golden."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.ops import selective_scan, selective_scan_bld, selective_state_update


def _numpy_selective_scan(
    u, delta, A, B, C, D=None, z=None, delta_bias=None, delta_softplus=False,
    initial_state=None,
):
    """Independent float64 NumPy oracle in reference (B, D, L) layout."""
    u = np.asarray(u, dtype=np.float64)
    delta = np.asarray(delta, dtype=np.float64)
    if delta_bias is not None:
        delta = delta + np.asarray(delta_bias, dtype=np.float64)[None, :, None]
    if delta_softplus:
        delta = np.logaddexp(delta, 0.0)
    bsz, d, L = u.shape
    n = A.shape[1]
    A = np.asarray(A, dtype=np.float64)
    B = np.asarray(B, dtype=np.float64)
    C = np.asarray(C, dtype=np.float64)
    h = (
        np.zeros((bsz, d, n))
        if initial_state is None
        else np.asarray(initial_state, dtype=np.float64).copy()
    )
    ys = np.zeros((bsz, d, L))
    for t in range(L):
        dA = np.exp(delta[:, :, t, None] * A[None])
        dBu = delta[:, :, t, None] * u[:, :, t, None] * B[:, None, :, t]
        h = dA * h + dBu
        ys[:, :, t] = np.einsum("bdn,bn->bd", h, C[:, :, t])
    out = ys
    if D is not None:
        out = out + u * np.asarray(D, dtype=np.float64)[None, :, None]
    if z is not None:
        zf = np.asarray(z, dtype=np.float64)
        out = out * (zf / (1.0 + np.exp(-zf)))
    return out, h


def _rand_inputs(key, bsz=2, d=8, L=13, n=4, with_all=True):
    ks = jax.random.split(key, 7)
    u = jax.random.normal(ks[0], (bsz, d, L), jnp.float32)
    delta = jax.random.normal(ks[1], (bsz, d, L), jnp.float32) * 0.5
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (bsz, n, L), jnp.float32)
    C = jax.random.normal(ks[4], (bsz, n, L), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32) if with_all else None
    z = jax.random.normal(ks[6], (bsz, d, L), jnp.float32) if with_all else None
    dbias = jnp.linspace(-0.2, 0.4, d) if with_all else None
    return u, delta, A, B, C, D, z, dbias


@pytest.mark.parametrize("method", ["ref", "chunked"])
@pytest.mark.slow
def test_matches_numpy_oracle(method):
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(0))
    got = selective_scan(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        method=method, chunk_size=4,
    )
    want, _ = _numpy_selective_scan(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("method", ["ref", "chunked"])
def test_initial_state_and_last_state(method):
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(1))
    h0 = jax.random.normal(jax.random.PRNGKey(9), (2, 8, 4), jnp.float32)
    got, h_last = selective_scan(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        initial_state=h0, return_last_state=True, method=method, chunk_size=5,
    )
    want, h_want = _numpy_selective_scan(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        initial_state=h0,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_last), h_want, rtol=1e-5, atol=1e-5)


def test_chunked_equals_ref_when_length_not_divisible():
    # L=13 with chunk 8 exercises the padding path.
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(2), L=13)
    kwargs = dict(delta_bias=dbias, delta_softplus=True, return_last_state=True)
    y_ref, h_ref = selective_scan(u, delta, A, B, C, D, z=z, method="ref", **kwargs)
    y_ch, h_ch = selective_scan(
        u, delta, A, B, C, D, z=z, method="chunked", chunk_size=8, **kwargs
    )
    np.testing.assert_allclose(np.asarray(y_ch), np.asarray(y_ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(h_ch), np.asarray(h_ref), rtol=1e-5, atol=1e-6)


@pytest.mark.slow
def test_streaming_split_equals_full():
    """Carrying last_state across a split reproduces the full scan."""
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(3), L=12)
    split = 5
    kwargs = dict(delta_bias=dbias, delta_softplus=True, method="chunked", chunk_size=4)
    full = selective_scan(u, delta, A, B, C, D, z=z, **kwargs)

    y1, h = selective_scan(
        u[..., :split], delta[..., :split], A, B[..., :split], C[..., :split], D,
        z=z[..., :split], return_last_state=True, **kwargs,
    )
    y2 = selective_scan(
        u[..., split:], delta[..., split:], A, B[..., split:], C[..., split:], D,
        z=z[..., split:], initial_state=h, **kwargs,
    )
    stitched = jnp.concatenate([y1, y2], axis=-1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=1e-5, atol=1e-6
    )


@pytest.mark.slow
def test_gradients_flow_through_state():
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(4), L=10)
    h0 = jnp.zeros((2, 8, 4), jnp.float32)

    def loss(u_, h0_):
        y1, h = selective_scan(
            u_[..., :4], delta[..., :4], A, B[..., :4], C[..., :4], D,
            z=z[..., :4], delta_bias=dbias, delta_softplus=True,
            initial_state=h0_, return_last_state=True,
        )
        y2 = selective_scan(
            u_[..., 4:], delta[..., 4:], A, B[..., 4:], C[..., 4:], D,
            z=z[..., 4:], delta_bias=dbias, delta_softplus=True, initial_state=h,
        )
        return jnp.sum(y1) + jnp.sum(y2)

    gu, gh0 = jax.grad(loss, argnums=(0, 1))(u, h0)
    assert jnp.all(jnp.isfinite(gu)) and jnp.all(jnp.isfinite(gh0))
    # Early tokens must influence late outputs through the carried state.
    assert float(jnp.abs(gu[..., 0]).sum()) > 0.0


def test_bld_layout_agrees_with_reference_layout():
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(5))
    y_ref_layout = selective_scan(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True
    )
    y_bld = selective_scan_bld(
        u.swapaxes(1, 2), delta.swapaxes(1, 2), A, B.swapaxes(1, 2),
        C.swapaxes(1, 2), D, z=z.swapaxes(1, 2), delta_bias=dbias,
        delta_softplus=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_bld.swapaxes(1, 2)), np.asarray(y_ref_layout), rtol=1e-6, atol=1e-6
    )


def test_state_update_matches_length_one_scan():
    u, delta, A, B, C, D, z, dbias = _rand_inputs(jax.random.PRNGKey(6), L=1)
    h0 = jax.random.normal(jax.random.PRNGKey(7), (2, 8, 4), jnp.float32)
    y_scan, h_scan = selective_scan(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        initial_state=h0, return_last_state=True,
    )
    y_step, h_step = selective_state_update(
        h0, u[..., 0], delta[..., 0], A, B[..., 0], C[..., 0], D,
        z=z[..., 0], dt_bias=dbias, dt_softplus=True,
    )
    np.testing.assert_allclose(
        np.asarray(y_step), np.asarray(y_scan[..., 0]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(h_step), np.asarray(h_scan), rtol=1e-5, atol=1e-6)
