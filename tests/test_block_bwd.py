"""Whole-Block fused backward (ops/pallas/block_bwd) gradient parity.

With VIDEOMAMBA_BLOCK_BWD=fused the Block routes training calls through the
block-fused forward and the single mega-kernel backward; unset, the same
call takes the mixer-level path. Both compute the same function, so their
float32 gradients must agree to near-machine precision on every parameter
and input — including streaming-state gradients (h0, conv_state) and the
carried residual.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.models.block import Block
from videomamba_tpu.models.mamba import Mamba


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("VIDEOMAMBA_PALLAS_INTERPRET", "1")


def _setup(key, bsz, seqlen, norm_type, d_model=64, residual_in_fp32=True):
    mix = Mamba(d_model=d_model, layer_idx=0)
    blk = Block(dim=d_model, mixer=mix, norm_type=norm_type,
                fused_add_norm=True, residual_in_fp32=residual_in_fp32)
    p = blk.init(jax.random.PRNGKey(key))
    ks = jax.random.split(jax.random.PRNGKey(key + 1), 6)
    hid = jax.random.normal(ks[0], (bsz, seqlen, d_model), jnp.float32)
    res = jax.random.normal(ks[1], (bsz, seqlen, d_model), jnp.float32)
    go = jax.random.normal(ks[2], (bsz, seqlen, d_model), jnp.float32)
    gr = jax.random.normal(ks[3], (bsz, seqlen, d_model), jnp.float32) * 0.3
    h0 = jax.random.normal(
        ks[4], (bsz, mix.d_inner, mix.d_state), jnp.float32) * 0.1
    cs = jax.random.normal(
        ks[5], (bsz, mix.d_inner, mix.d_conv), jnp.float32) * 0.5
    return blk, p, hid, res, go, gr, h0, cs


def _grads(blk, p, hid, res, go, gr, h0, cs, backend, monkeypatch):
    if backend == "fused":
        monkeypatch.setenv("VIDEOMAMBA_BLOCK_BWD", "fused")
    else:
        monkeypatch.delenv("VIDEOMAMBA_BLOCK_BWD", raising=False)

    def loss(pp, hh, rr, hh0, ccs):
        out, new_res, (nc, ns) = blk(pp, hh, rr, state=(ccs, hh0),
                                     return_state=True, deterministic=False)
        return (jnp.sum(out * go) + jnp.sum(new_res * gr)
                + jnp.sum(ns * 0.1) + jnp.sum(nc * 0.05))

    return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(p, hid, res, h0, cs)


def _assert_close(g_ref, g_new, tol=2e-5):
    flat_r, _ = jax.tree_util.tree_flatten_with_path(g_ref)
    flat_n, _ = jax.tree_util.tree_flatten_with_path(g_new)
    for (path, a), (_, b) in zip(flat_r, flat_n):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        denom = max(np.abs(a).max(), 1e-6)
        err = np.abs(a - b).max() / denom
        name = jax.tree_util.keystr(path)
        assert err < tol, f"{name}: rel err {err:.3e} >= {tol}"


@pytest.mark.slow
def test_block_bwd_matches_mixer_path_rms(monkeypatch):
    setup = _setup(0, bsz=2, seqlen=40, norm_type="rms")
    blk, p = setup[0], setup[1]
    assert blk._use_block_fused(p)
    g_m = _grads(*setup, "mixer", monkeypatch)
    g_f = _grads(*setup, "fused", monkeypatch)
    _assert_close(g_m, g_f)


@pytest.mark.slow
def test_block_bwd_matches_mixer_path_layernorm_multiblock(monkeypatch):
    """seqlen 300 -> three 128-blocks with padding: exercises the reverse
    conv carry, the prev-block in_proj recompute, and the LN backward."""
    setup = _setup(2, bsz=1, seqlen=300, norm_type="layer")
    g_m = _grads(*setup, "mixer", monkeypatch)
    g_f = _grads(*setup, "fused", monkeypatch)
    _assert_close(g_m, g_f)


@pytest.mark.slow
def test_block_bwd_residual_fp32_false(monkeypatch):
    """residual_in_fp32=False: the forward norms the unrounded f32 sum
    before casting res_out to its storage dtype, and the fused backward
    must linearize at the same f32 point (models/block.py _block_fused_bwd
    recomputes res_out in f32). f32 inputs keep the bar tight; a bf16
    variant below loosens it to bf16 rounding."""
    setup = _setup(4, bsz=1, seqlen=40, norm_type="rms",
                   residual_in_fp32=False)
    g_m = _grads(*setup, "mixer", monkeypatch)
    g_f = _grads(*setup, "fused", monkeypatch)
    _assert_close(g_m, g_f)


@pytest.mark.slow
def test_block_bwd_bf16_residual_fp32_false(monkeypatch):
    """bf16 activations + residual_in_fp32=False, fused vs mixer-path
    gradients: agreement within bf16 rounding noise (loosened bar)."""
    blk, p, hid, res, go, gr, h0, cs = _setup(
        5, bsz=1, seqlen=40, norm_type="rms", residual_in_fp32=False)
    hid = hid.astype(jnp.bfloat16)
    res = res.astype(jnp.bfloat16)
    setup = (blk, p, hid, res, go, gr, h0, cs)
    g_m = _grads(*setup, "mixer", monkeypatch)
    g_f = _grads(*setup, "fused", monkeypatch)
    _assert_close(g_m, g_f, tol=2e-2)


def test_training_gate_requires_opt_in(monkeypatch):
    """Without VIDEOMAMBA_BLOCK_BWD=fused, non-deterministic calls must NOT
    take the block-fused route (it measured slower for training)."""
    from videomamba_tpu.models import block as blk_mod

    monkeypatch.delenv("VIDEOMAMBA_BLOCK_BWD", raising=False)
    assert not blk_mod._block_bwd_training_opt_in()
    monkeypatch.setenv("VIDEOMAMBA_BLOCK_BWD", "fused")
    assert blk_mod._block_bwd_training_opt_in()
    monkeypatch.setenv("VIDEOMAMBA_BLOCK_BWD", "composite")
    assert not blk_mod._block_bwd_training_opt_in()
    assert blk_mod._block_bwd_backend() == "composite"
