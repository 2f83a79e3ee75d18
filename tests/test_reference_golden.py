"""Golden numerical parity against reference (torch) semantics.

Round-1 parity evidence was internal self-consistency (Pallas vs in-repo
oracle). This suite closes the loop against the REFERENCE semantics through
the torch checkpoint format: a CPU torch oracle (tests/reference_oracle.py,
independent reimplementation of /root/reference numerics) is initialized
with realistic nonzero values, its ``state_dict`` is saved as a real ``.pt``
and loaded through ``videomamba_tpu.checkpoint.load_state_dict`` — so the
layout transposes of the bridge are exactly what is under test. Bars:

* end-to-end ``x_vis`` / ``x_pool`` rel-err <= 1e-3 (driver north star;
  BASELINE.md) — asserted at 2e-4 in fp32,
* layer-level mixer parity <= 1e-4 (reference
  scripts/check_streaming_state.py:55),
* streaming chunked parity incl. carried (conv, ssm) states,
* the exporter round-trip loads into torch with ``strict=True``.

On CPU both ``use_fast_path`` settings lower to the chunked XLA scan; the
Pallas kernels are tied to the same oracle by the scan-level test below plus
the existing kernel-parity gates (tests/test_pallas_scan.py).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from tests.reference_oracle import (
    OracleMamba,
    OracleVideoMamba,
    reference_style_init_,
    selective_scan_oracle,
)
from videomamba_tpu.checkpoint import load_state_dict, save_torch_state_dict
from videomamba_tpu.models.mamba import Mamba
from videomamba_tpu.models.videomamba import PretrainVideoMamba


GEOM = dict(img_size=16, patch_size=8, depth=2, embed_dim=32, channels=3,
            kernel_size=1, num_frames=8)


def rel_err(a, b) -> float:
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b).max(), 1e-8)
    return float(np.abs(a - b).max() / denom)


def make_pair(tmp_path, rms_norm=True, fused_add_norm=True, use_fast_path=False,
              pool_type="cls+avg", seed=0, jax_overrides=None):
    """Oracle + JAX model wired together through a real .pt checkpoint."""
    oracle = OracleVideoMamba(rms_norm=rms_norm, pool_type=pool_type, **GEOM)
    reference_style_init_(oracle, seed=seed)
    oracle.eval()
    ckpt = tmp_path / "oracle.pt"
    torch.save(oracle.state_dict(), str(ckpt))

    jax_kwargs = dict(GEOM, rms_norm=rms_norm, fused_add_norm=fused_add_norm,
                      pool_type=pool_type, ssm_cfg={"use_fast_path": use_fast_path})
    jax_kwargs.update(jax_overrides or {})
    model = PretrainVideoMamba(**jax_kwargs)
    load_state_dict(str(ckpt), model,
                    ckpt_num_frame=GEOM["num_frames"],
                    num_frames=jax_kwargs["num_frames"])
    return oracle, model


def video(bsz=2, frames=8, hw=16, seed=3):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(bsz, 3, frames, hw, hw, generator=g)


# ------------------------------------------------------------------ scan op

def test_scan_matches_torch_oracle():
    """selective_scan_bld (both XLA methods) == the torch reference scan."""
    from videomamba_tpu.ops.selective_scan import selective_scan_bld

    g = torch.Generator().manual_seed(7)
    bsz, L, d, n = 2, 24, 8, 4
    u = torch.randn(bsz, L, d, generator=g)
    dt = torch.randn(bsz, L, d, generator=g) * 0.5
    A = -torch.rand(d, n, generator=g) - 0.1
    B = torch.randn(bsz, L, n, generator=g)
    C = torch.randn(bsz, L, n, generator=g)
    D = torch.randn(d, generator=g)
    z = torch.randn(bsz, L, d, generator=g)
    bias = torch.randn(d, generator=g) * 0.2
    h0 = torch.randn(bsz, d, n, generator=g)

    y_t, h_t = selective_scan_oracle(u, dt, A, B, C, D_skip=D, z=z,
                                     dt_bias=bias, h0=h0)
    args = [jnp.asarray(v.numpy()) for v in (u, dt, A, B, C)]
    for method in ("ref", "chunked"):
        y_j, h_j = selective_scan_bld(
            *args, D=jnp.asarray(D.numpy()), z=jnp.asarray(z.numpy()),
            delta_bias=jnp.asarray(bias.numpy()), delta_softplus=True,
            initial_state=jnp.asarray(h0.numpy()), return_last_state=True,
            method=method,
        )
        assert rel_err(y_j, y_t.numpy()) < 1e-5, method
        assert rel_err(h_j, h_t.numpy()) < 1e-5, method


# -------------------------------------------------------------- mixer layer

@pytest.mark.parametrize("use_fast_path", [False, True])
@pytest.mark.slow
def test_mixer_layer_parity(use_fast_path):
    """Bare Mamba layer vs torch oracle at the reference's 1e-4 layer bar,
    with weights mapped through the torch layout conventions."""
    d_model = 32
    om = OracleMamba(d_model)
    g = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in om.parameters():
            if p is om.dt_proj.bias:
                dt = torch.exp(torch.rand(om.d_inner, generator=g) * 4.6 - 6.9)
                p.copy_(dt + torch.log(-torch.expm1(-dt)))
            elif p is om.A_log:
                p.add_(0.05 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)
    om.eval()

    jm = Mamba(d_model, use_fast_path=use_fast_path)
    params = {
        "in_proj": {"kernel": jnp.asarray(om.in_proj.weight.detach().numpy().T)},
        "conv1d": {
            "weight": jnp.asarray(om.conv1d.weight.detach().numpy()[:, 0, :].T),
            "bias": jnp.asarray(om.conv1d.bias.detach().numpy()),
        },
        "x_proj": {"kernel": jnp.asarray(om.x_proj.weight.detach().numpy().T)},
        "dt_proj": {
            "kernel": jnp.asarray(om.dt_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(om.dt_proj.bias.detach().numpy()),
        },
        "A_log": jnp.asarray(om.A_log.detach().numpy()),
        "D": jnp.asarray(om.D.detach().numpy()),
        "out_proj": {"kernel": jnp.asarray(om.out_proj.weight.detach().numpy().T)},
    }

    x = torch.randn(2, 20, d_model, generator=g)
    with torch.no_grad():
        y_t, (conv_t, ssm_t) = om(x, return_state=True)
    y_j, (conv_j, ssm_j) = jm(params, jnp.asarray(x.numpy()), return_state=True)
    assert rel_err(y_j, y_t.numpy()) < 1e-4
    assert rel_err(conv_j, conv_t.numpy()) < 1e-5
    assert rel_err(ssm_j, ssm_t.numpy()) < 1e-4

    # Streaming: two chunks == full, against the oracle's own chunking.
    st = om.allocate_state(2)
    with torch.no_grad():
        y1_t, st = om(x[:, :12], state=st, return_state=True)
        y2_t, st = om(x[:, 12:], state=st, return_state=True)
    st_j = jm.allocate_state(2)
    y1_j, st_j = jm(params, jnp.asarray(x[:, :12].numpy()), state=st_j,
                    return_state=True)
    y2_j, st_j = jm(params, jnp.asarray(x[:, 12:].numpy()), state=st_j,
                    return_state=True)
    assert rel_err(y1_j, y1_t.numpy()) < 1e-4
    assert rel_err(y2_j, y2_t.numpy()) < 1e-4
    assert rel_err(st_j[0], st[0].numpy()) < 1e-5
    assert rel_err(st_j[1], st[1].numpy()) < 1e-4


# -------------------------------------------------------------- end-to-end

@pytest.mark.parametrize("rms_norm,fused_add_norm,use_fast_path", [
    (True, True, True),
    (True, False, False),
    (False, True, True),
    (False, False, False),
])
@pytest.mark.slow
def test_full_forward_parity_through_bridge(tmp_path, rms_norm, fused_add_norm,
                                            use_fast_path):
    oracle, model = make_pair(tmp_path, rms_norm=rms_norm,
                              fused_add_norm=fused_add_norm,
                              use_fast_path=use_fast_path)
    x = video()
    with torch.no_grad():
        x_vis_t, x_pool_t = oracle(x)
    x_vis_j, x_pool_j = model(jnp.asarray(x.numpy()))
    assert rel_err(x_vis_j, x_vis_t.numpy()) < 2e-4
    assert rel_err(x_pool_j, x_pool_t.numpy()) < 2e-4


def test_streaming_parity_through_bridge(tmp_path):
    """Chunked streaming: per-chunk outputs AND carried states match torch."""
    oracle, model = make_pair(tmp_path, pool_type="avg")
    x = video(frames=8)

    st_t = oracle.allocate_state(2)
    st_j = model.allocate_state(2)
    offset = 0
    for chunk in (x[:, :, :4], x[:, :, 4:]):
        with torch.no_grad():
            vis_t, pool_t, st_t = oracle(
                chunk, ssm_state=st_t, temporal_pos_offset=offset
            )
        vis_j, pool_j, st_j = model(
            jnp.asarray(chunk.numpy()), ssm_state=st_j,
            temporal_pos_offset=offset,
        )
        assert rel_err(vis_j, vis_t.numpy()) < 2e-4
        assert rel_err(pool_j, pool_t.numpy()) < 2e-4
        offset += 4

    for (cj, sj), (ct, st) in zip(st_j, st_t):
        assert rel_err(cj, ct.numpy()) < 1e-5
        assert rel_err(sj, st.numpy()) < 1e-4


def test_beyond_horizon_temporal_extrapolation_parity(tmp_path):
    """temporal_pos_offset past the trained horizon: both sides linearly
    extrapolate (videomamba.py:655-675) and must agree."""
    oracle, model = make_pair(tmp_path, pool_type="avg")
    x = video(frames=4)
    st_t = oracle.allocate_state(2)
    st_j = model.allocate_state(2)
    with torch.no_grad():  # prime chunk so continuation semantics apply
        _, _, st_t = oracle(x, ssm_state=st_t, temporal_pos_offset=0)
    _, _, st_j = model(jnp.asarray(x.numpy()), ssm_state=st_j,
                       temporal_pos_offset=0)
    with torch.no_grad():
        vis_t, pool_t, _ = oracle(x, ssm_state=st_t, temporal_pos_offset=10)
    vis_j, pool_j, _ = model(jnp.asarray(x.numpy()), ssm_state=st_j,
                             temporal_pos_offset=10)
    assert rel_err(vis_j, vis_t.numpy()) < 2e-4
    assert rel_err(pool_j, pool_t.numpy()) < 2e-4


def test_masked_keep_temporal_parity(tmp_path):
    oracle, model = make_pair(tmp_path, pool_type="cls+avg")
    x = video()
    # 33 tokens (1 CLS + 8 frames x 4 patches); hide 2 patches/sample,
    # different positions per sample, CLS visible.
    mask = torch.zeros(2, 33, dtype=torch.bool)
    mask[0, [3, 9]] = True
    mask[1, [5, 17]] = True
    with torch.no_grad():
        vis_t, pool_t = oracle(x, mask=mask, keep_temporal=True)
    vis_j, pool_j = model(jnp.asarray(x.numpy()), mask=mask.numpy(),
                          keep_temporal=True)
    assert rel_err(vis_j, vis_t.numpy()) < 2e-4
    assert rel_err(pool_j, pool_t.numpy()) < 2e-4


def test_export_roundtrip_into_torch(tmp_path):
    """save_torch_state_dict output loads strict into the torch oracle and
    reproduces the JAX model's outputs — the exporter direction."""
    model = PretrainVideoMamba(rng=5, **GEOM)
    ckpt = tmp_path / "export.pt"
    save_torch_state_dict(str(ckpt), model)

    oracle = OracleVideoMamba(**GEOM)
    missing_unexpected = oracle.load_state_dict(
        torch.load(str(ckpt), weights_only=True), strict=True
    )
    assert not missing_unexpected.missing_keys
    assert not missing_unexpected.unexpected_keys
    oracle.eval()

    x = video(seed=9)
    with torch.no_grad():
        x_vis_t, x_pool_t = oracle(x)
    x_vis_j, x_pool_j = model(jnp.asarray(x.numpy()))
    assert rel_err(x_vis_j, x_vis_t.numpy()) < 2e-4
    assert rel_err(x_pool_j, x_pool_t.numpy()) < 2e-4


def test_pos_embed_interpolation_parity(tmp_path):
    """Load a 16px/8-frame checkpoint into a 24px/16-frame model: the
    bridge's bicubic + linear resampling must match torch F.interpolate
    (reference loader videomamba.py:1086-1144)."""
    oracle_src = OracleVideoMamba(**GEOM)
    reference_style_init_(oracle_src, seed=4)
    sd = oracle_src.state_dict()
    ckpt = tmp_path / "small.pt"
    torch.save(sd, str(ckpt))

    tgt_geom = dict(GEOM, img_size=24, num_frames=16)
    model = PretrainVideoMamba(ssm_cfg={"use_fast_path": False}, **tgt_geom)
    load_state_dict(str(ckpt), model, ckpt_num_frame=8, num_frames=16)

    # Torch-side reference interpolation of the same checkpoint.
    sd2 = {k: v.clone() for k, v in sd.items()}
    pos = sd2["pos_embed"][:, 1:].reshape(1, 2, 2, 32).permute(0, 3, 1, 2)
    pos = torch.nn.functional.interpolate(
        pos, size=(3, 3), mode="bicubic", align_corners=False
    ).permute(0, 2, 3, 1).reshape(1, 9, 32)
    sd2["pos_embed"] = torch.cat([sd2["pos_embed"][:, :1], pos], dim=1)
    tpe = sd2["temporal_pos_embedding"].permute(0, 2, 1)
    tpe = torch.nn.functional.interpolate(
        tpe, size=16, mode="linear", align_corners=False
    ).permute(0, 2, 1)
    sd2["temporal_pos_embedding"] = tpe

    oracle_tgt = OracleVideoMamba(**tgt_geom)
    oracle_tgt.load_state_dict(sd2, strict=True)
    oracle_tgt.eval()

    np.testing.assert_allclose(
        np.asarray(model.params["pos_embed"]),
        sd2["pos_embed"].numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(model.params["temporal_pos_embedding"]),
        sd2["temporal_pos_embedding"].numpy(), rtol=1e-5, atol=1e-6,
    )

    x = video(frames=16, hw=24, seed=12)
    with torch.no_grad():
        x_vis_t, x_pool_t = oracle_tgt(x)
    x_vis_j, x_pool_j = model(jnp.asarray(x.numpy()))
    assert rel_err(x_vis_j, x_vis_t.numpy()) < 2e-4
    assert rel_err(x_pool_j, x_pool_t.numpy()) < 2e-4
