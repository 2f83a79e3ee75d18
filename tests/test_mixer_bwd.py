"""Fused mixer mega-backward kernel vs the composite backward.

The fused mixer (`models/mamba.py::_fused_mixer`) has two backward
implementations: the single Pallas mega-kernel (`ops/pallas/mixer_bwd`,
default) and the composite path (XLA recompute + `scan_bwd_pallas`),
selectable via VIDEOMAMBA_MIXER_BWD. In float32 both must agree to
near-machine precision on every cotangent — including the streaming-state
gradients (dh0, dconv_state) the reference's fused path does not support
(mamba_simple.py:343-367 is stateless-only).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models import mamba as M


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


ARG_NAMES = ["dx", "dz", "dconv_w", "dconv_b", "dwx", "dwdt", "dbias",
             "dA", "dD", "dh0", "dconv_state"]


def _setup(key, bsz, seqlen, d_model=64):
    mix = M.Mamba(d_model=d_model, layer_idx=0)
    p = mix.init(jax.random.PRNGKey(key), jnp.float32)
    di, n = mix.d_inner, mix.d_state
    ks = jax.random.split(jax.random.PRNGKey(key + 1), 8)
    x_in = jax.random.normal(ks[0], (bsz, seqlen, di), jnp.float32)
    z_in = jax.random.normal(ks[1], (bsz, seqlen, di), jnp.float32)
    h0 = jax.random.normal(ks[2], (bsz, di, n), jnp.float32) * 0.1
    cs = jax.random.normal(ks[3], (bsz, di, mix.d_conv), jnp.float32) * 0.5
    gy = jax.random.normal(ks[4], (bsz, seqlen, di), jnp.float32)
    ghl = jax.random.normal(ks[5], (bsz, di, n), jnp.float32) * 0.3
    A = -jnp.exp(p["A_log"].astype(jnp.float32))
    args = (x_in, z_in, p["conv1d"]["weight"], p["conv1d"]["bias"],
            p["x_proj"]["kernel"], p["dt_proj"]["kernel"],
            p["dt_proj"]["bias"].astype(jnp.float32), A,
            p["D"].astype(jnp.float32), h0, cs)
    return args, gy, ghl


def _grads(args, gy, ghl, backend, monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_MIXER_BWD", backend)

    def loss(*a):
        y, hl = M._fused_mixer(*a)
        return jnp.sum(y * gy) + jnp.sum(hl * ghl)

    return jax.grad(loss, argnums=tuple(range(len(args))))(*args)


def _assert_close(g_ref, g_new, tol):
    for nm, a, b in zip(ARG_NAMES, g_ref, g_new):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(np.abs(a).max(), 1e-6)
        err = np.abs(a - b).max() / denom
        assert err < tol, f"{nm}: rel err {err:.3e} >= {tol}"


@pytest.mark.slow
def test_backends_match_single_block(monkeypatch):
    """One time block, nonzero h0/conv_state/ghl: every gradient agrees."""
    args, gy, ghl = _setup(0, bsz=2, seqlen=24)
    g_c = _grads(args, gy, ghl, "composite", monkeypatch)
    g_f = _grads(args, gy, ghl, "fused", monkeypatch)
    _assert_close(g_c, g_f, 2e-5)


@pytest.mark.slow
def test_backends_match_multi_block_with_padding(monkeypatch):
    """seqlen 100 -> forward pads to 128, backward tiles 64: exercises the
    reverse dcpre carry across block boundaries and pad-row masking."""
    args, gy, ghl = _setup(2, bsz=1, seqlen=100)
    g_c = _grads(args, gy, ghl, "composite", monkeypatch)
    g_f = _grads(args, gy, ghl, "fused", monkeypatch)
    _assert_close(g_c, g_f, 2e-5)


def test_backend_env_switch(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_MIXER_BWD", "composite")
    assert M._mixer_bwd_backend() == "composite"
    monkeypatch.setenv("VIDEOMAMBA_MIXER_BWD", "fused")
    assert M._mixer_bwd_backend() == "fused"
    monkeypatch.delenv("VIDEOMAMBA_MIXER_BWD")
    assert M._mixer_bwd_backend() == "fused"  # default
    monkeypatch.setenv("VIDEOMAMBA_MIXER_BWD", "bogus")
    assert M._mixer_bwd_backend() == "fused"


def test_supported_envelope_matches_forward():
    """The bwd kernel must cover every shape the fused forward accepts —
    _fused_mixer is only reachable through that gate."""
    from videomamba_tpu.ops.pallas.mixer_bwd import mixer_bwd_supported
    from videomamba_tpu.ops.pallas.mixer_fused import mixer_fused_supported

    for di, r, n in [(128, 8, 16), (1536, 48, 16), (256, 129, 16),
                     (200, 8, 16), (512, 16, 132), (384, 24, 12)]:
        assert mixer_bwd_supported(di, r, n) == mixer_fused_supported(di, r, n)
