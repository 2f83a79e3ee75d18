"""Sequence-parallel scan: 8-way time-sharded == single-device scan."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from videomamba_tpu.ops.selective_scan import selective_scan_bld
from videomamba_tpu.parallel.sequence import sequence_parallel_scan


def _inputs(key, bsz=2, L=64, d=16, n=8):
    ks = jax.random.split(jax.random.PRNGKey(key), 7)
    u = jax.random.normal(ks[0], (bsz, L, d), jnp.float32)
    delta = jax.random.normal(ks[1], (bsz, L, d), jnp.float32) * 0.3
    A = -jnp.exp(jax.random.normal(ks[2], (d, n), jnp.float32) * 0.3)
    B = jax.random.normal(ks[3], (bsz, L, n), jnp.float32)
    C = jax.random.normal(ks[4], (bsz, L, n), jnp.float32)
    D = jax.random.normal(ks[5], (d,), jnp.float32)
    z = jax.random.normal(ks[6], (bsz, L, d), jnp.float32)
    dbias = jnp.linspace(-0.1, 0.2, d)
    return u, delta, A, B, C, D, z, dbias


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), ("sp",))


def test_sequence_parallel_matches_single_device(mesh):
    u, delta, A, B, C, D, z, dbias = _inputs(0, L=64)
    h0 = jax.random.normal(jax.random.PRNGKey(9), (2, 16, 8), jnp.float32) * 0.1

    want, h_want = selective_scan_bld(
        u, delta, A, B, C, D, z=z, delta_bias=dbias, delta_softplus=True,
        initial_state=h0, return_last_state=True,
    )

    @jax.jit
    def run(u, delta, B, C, z):
        fn = jax.shard_map(
            lambda *a: sequence_parallel_scan(
                *a, delta_bias=dbias, delta_softplus=True, initial_state=h0,
                axis_name="sp",
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"), P(None, "sp"), P(None), P(None, "sp"),
                      P(None, "sp"), P(None), P(None, "sp")),
            out_specs=(P(None, "sp"), P(None)),
            check_vma=False,
        )
        return fn(u, delta, A, B, C, D, z)

    got, h_got = run(u, delta, B, C, z)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_want), rtol=2e-4, atol=2e-4)


def test_sequence_parallel_without_optionals(mesh):
    u, delta, A, B, C, _, _, _ = _inputs(1, L=32)
    want = selective_scan_bld(u, delta, A, B, C, delta_softplus=True)

    @jax.jit
    def run(u, delta, B, C):
        fn = jax.shard_map(
            lambda uu, dd, bb, cc: sequence_parallel_scan(
                uu, dd, A, bb, cc, delta_softplus=True, axis_name="sp",
            ),
            mesh=mesh,
            in_specs=(P(None, "sp"),) * 4,
            out_specs=(P(None, "sp"), P(None)),
            check_vma=False,
        )
        return fn(u, delta, B, C)

    got, _ = run(u, delta, B, C)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)
