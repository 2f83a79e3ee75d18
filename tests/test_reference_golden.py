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

import ast
import os

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
              pool_type="cls+avg", seed=0, jax_overrides=None, geom=None):
    """Oracle + JAX model wired together through a real .pt checkpoint."""
    geom = GEOM if geom is None else geom
    oracle = OracleVideoMamba(rms_norm=rms_norm, pool_type=pool_type, **geom)
    reference_style_init_(oracle, seed=seed)
    oracle.eval()
    ckpt = tmp_path / "oracle.pt"
    torch.save(oracle.state_dict(), str(ckpt))

    jax_kwargs = dict(geom, rms_norm=rms_norm, fused_add_norm=fused_add_norm,
                      pool_type=pool_type, ssm_cfg={"use_fast_path": use_fast_path})
    jax_kwargs.update(jax_overrides or {})
    model = PretrainVideoMamba(**jax_kwargs)
    load_state_dict(str(ckpt), model,
                    ckpt_num_frame=geom["num_frames"],
                    num_frames=jax_kwargs["num_frames"])
    return oracle, model


def video(bsz=2, frames=8, hw=16, seed=3):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(bsz, 3, frames, hw, hw, generator=g)


# ----------------------------------------------- the reference's OWN scan

REFERENCE_MAMBA_SIMPLE = "/root/reference/models/videomamba/mamba_simple.py"


def _load_reference_scan():
    """Execute the reference's own pure-torch scan (`_selective_scan_ref`,
    mamba_simple.py:30-106) as the ultimate oracle.

    The module cannot be imported (module-level ``causal_conv1d`` import
    fails off-GPU), so the single function is extracted from the source AST
    at test time — nothing is vendored into this repo. This kills the
    common-mode risk of testing only against a builder-authored oracle.
    """
    with open(REFERENCE_MAMBA_SIMPLE) as f:
        tree = ast.parse(f.read())
    fn = next(
        n for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == "_selective_scan_ref"
    )
    from typing import Tuple, Union
    from einops import rearrange, repeat

    ns = {
        "torch": torch, "F": torch.nn.functional, "rearrange": rearrange,
        "repeat": repeat, "Union": Union, "Tuple": Tuple,
        "Tensor": torch.Tensor,
    }
    module = ast.Module(body=[fn], type_ignores=[])
    exec(compile(module, REFERENCE_MAMBA_SIMPLE, "exec"), ns)
    return ns["_selective_scan_ref"]


reference_available = pytest.mark.skipif(
    not os.path.exists(REFERENCE_MAMBA_SIMPLE),
    reason="reference checkout not present",
)


def _scan_inputs(seed=7, bsz=2, L=24, d=8, n=4, with_h0=True):
    g = torch.Generator().manual_seed(seed)
    u = torch.randn(bsz, L, d, generator=g)
    dt = torch.randn(bsz, L, d, generator=g) * 0.5
    A = -torch.rand(d, n, generator=g) - 0.1
    B = torch.randn(bsz, L, n, generator=g)
    C = torch.randn(bsz, L, n, generator=g)
    D = torch.randn(d, generator=g)
    z = torch.randn(bsz, L, d, generator=g)
    bias = torch.randn(d, generator=g) * 0.2
    h0 = torch.randn(bsz, d, n, generator=g) if with_h0 else None
    return u, dt, A, B, C, D, z, bias, h0


@reference_available
@pytest.mark.parametrize("with_h0,return_last", [
    (True, True), (False, True), (False, False),
])
def test_builder_oracle_matches_reference_scan(with_h0, return_last):
    """tests/reference_oracle.selective_scan_oracle == the actual reference
    function, executed — including initial_state and return_last_state."""
    ref_scan = _load_reference_scan()
    u, dt, A, B, C, D, z, bias, h0 = _scan_inputs(with_h0=with_h0)

    # Reference computes in (B, D, L) / (B, N, L); ours in (B, L, D).
    ref_out = ref_scan(
        u.transpose(1, 2), dt.transpose(1, 2), A,
        B.transpose(1, 2), C.transpose(1, 2),
        D=D, z=z.transpose(1, 2), delta_bias=bias, delta_softplus=True,
        initial_state=h0, return_last_state=return_last,
    )
    y_ref = (ref_out[0] if return_last else ref_out).transpose(1, 2)
    y_o, h_o = selective_scan_oracle(
        u, dt, A, B, C, D_skip=D, z=z, dt_bias=bias, h0=h0
    )
    assert rel_err(y_o, y_ref) < 1e-6
    if return_last:
        assert rel_err(h_o, ref_out[1]) < 1e-6


@reference_available
@pytest.mark.parametrize("method", ["ref", "chunked"])
def test_jax_scan_matches_reference_scan(method):
    """selective_scan_bld == the actual reference function, executed."""
    from videomamba_tpu.ops.selective_scan import selective_scan_bld

    ref_scan = _load_reference_scan()
    u, dt, A, B, C, D, z, bias, h0 = _scan_inputs(seed=13)
    y_ref, h_ref = ref_scan(
        u.transpose(1, 2), dt.transpose(1, 2), A,
        B.transpose(1, 2), C.transpose(1, 2),
        D=D, z=z.transpose(1, 2), delta_bias=bias, delta_softplus=True,
        initial_state=h0, return_last_state=True,
    )
    y_j, h_j = selective_scan_bld(
        *(jnp.asarray(v.numpy()) for v in (u, dt, A, B, C)),
        D=jnp.asarray(D.numpy()), z=jnp.asarray(z.numpy()),
        delta_bias=jnp.asarray(bias.numpy()), delta_softplus=True,
        initial_state=jnp.asarray(h0.numpy()), return_last_state=True,
        method=method,
    )
    assert rel_err(y_j, y_ref.transpose(1, 2).numpy()) < 1e-5
    assert rel_err(h_j, h_ref.numpy()) < 1e-5


@reference_available
def test_pallas_interpret_scan_matches_reference_scan():
    """The Pallas kernel (interpret mode on CPU) == the reference function.

    Pallas-supported geometry: D multiple of 128, N multiple of 8."""
    from videomamba_tpu.ops.pallas.scan import scan_chunked_pallas

    ref_scan = _load_reference_scan()
    u, dt, A, B, C, D, z, bias, h0 = _scan_inputs(seed=17, L=16, d=128, n=8)
    y_ref, h_ref = ref_scan(
        u.transpose(1, 2), dt.transpose(1, 2), A,
        B.transpose(1, 2), C.transpose(1, 2),
        D=D, z=z.transpose(1, 2), delta_bias=bias, delta_softplus=True,
        initial_state=h0, return_last_state=True,
    )
    y_j, h_j = scan_chunked_pallas(
        *(jnp.asarray(v.numpy()) for v in (u, dt, A, B, C, D, z, bias, h0)),
        softplus=True, has_z=True, interpret=True,
    )
    assert rel_err(y_j, y_ref.transpose(1, 2).numpy()) < 1e-5
    assert rel_err(h_j, h_ref.numpy()) < 1e-5


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

def _mamba_params_from_oracle(om):
    """Torch OracleMamba weights -> JAX Mamba params (layout transposes)."""
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
    if om.in_proj.bias is not None:
        params["in_proj"]["bias"] = jnp.asarray(om.in_proj.bias.detach().numpy())
    if om.out_proj.bias is not None:
        params["out_proj"]["bias"] = jnp.asarray(om.out_proj.bias.detach().numpy())
    return params


def _randomize_oracle_mamba(om, g):
    """Realistic nonzero weights; dt_proj.bias gets the reference's
    softplus-inverse init so softplus(dt) stays in a sane range."""
    with torch.no_grad():
        for p in om.parameters():
            if p is om.dt_proj.bias:
                dt = torch.exp(torch.rand(om.d_inner, generator=g) * 4.6 - 6.9)
                p.copy_(dt + torch.log(-torch.expm1(-dt)))
            elif p is om.A_log:
                p.add_(0.05 * torch.randn(p.shape, generator=g))
            else:
                p.copy_(torch.randn(p.shape, generator=g) * 0.1)


@pytest.mark.parametrize("use_fast_path", [False, True])
@pytest.mark.slow
def test_mixer_layer_parity(use_fast_path):
    """Bare Mamba layer vs torch oracle at the reference's 1e-4 layer bar,
    with weights mapped through the torch layout conventions."""
    d_model = 32
    om = OracleMamba(d_model)
    g = torch.Generator().manual_seed(11)
    _randomize_oracle_mamba(om, g)
    om.eval()

    jm = Mamba(d_model, use_fast_path=use_fast_path)
    params = _mamba_params_from_oracle(om)

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


# ------------------------------------------------------------------ refiner

@pytest.mark.slow
def test_refiner_golden_parity():
    """BiMambaRefinerBlock vs the torch oracle refiner: [B,L,C] output,
    packed [B,T,N,C] output (frame-flip, not token-flip), 2-chunk streaming
    of the fwd state, and remat invariance (use_checkpoint=True identical)."""
    from tests.reference_oracle import OracleBiMambaRefiner
    from videomamba_tpu.models.refiner import BiMambaRefinerBlock

    dim = 32
    orf = OracleBiMambaRefiner(dim)
    g = torch.Generator().manual_seed(21)
    _randomize_oracle_mamba(orf.block_fwd.mixer, g)
    _randomize_oracle_mamba(orf.block_bwd.mixer, g)
    with torch.no_grad():
        orf.fusion_gate[0].weight.copy_(
            torch.randn(orf.fusion_gate[0].weight.shape, generator=g) * 0.1)
        orf.fusion_gate[0].bias.copy_(
            torch.randn(orf.fusion_gate[0].bias.shape, generator=g) * 0.1)
        orf.out_proj.weight.copy_(
            torch.randn(orf.out_proj.weight.shape, generator=g) * 0.1)
        orf.out_proj.bias.copy_(
            torch.randn(orf.out_proj.bias.shape, generator=g) * 0.1)
    orf.eval()

    jrf = BiMambaRefinerBlock(dim, ssm_cfg={"use_fast_path": False})

    def block_params(ob):
        return {
            "mixer": _mamba_params_from_oracle(ob.mixer),
            "norm": {"weight": jnp.asarray(ob.norm.weight.detach().numpy())},
        }

    params = {
        "block_fwd": block_params(orf.block_fwd),
        "block_bwd": block_params(orf.block_bwd),
        "fusion_gate": {
            "kernel": jnp.asarray(orf.fusion_gate[0].weight.detach().numpy().T),
            "bias": jnp.asarray(orf.fusion_gate[0].bias.detach().numpy()),
        },
        "out_proj": {
            "kernel": jnp.asarray(orf.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(orf.out_proj.bias.detach().numpy()),
        },
    }

    # Flat [B, L, C].
    x = torch.randn(2, 24, dim, generator=g)
    with torch.no_grad():
        y_t, st_t = orf(x)
    y_j, st_j = jrf(params, jnp.asarray(x.numpy()))
    assert rel_err(y_j, y_t.numpy()) < 1e-4
    assert rel_err(st_j[0], st_t[0].numpy()) < 1e-5
    assert rel_err(st_j[1], st_t[1].numpy()) < 1e-4

    # Remat path computes the identical function.
    y_ckpt, _ = jrf(params, jnp.asarray(x.numpy()), use_checkpoint=True)
    np.testing.assert_allclose(
        np.asarray(y_ckpt), np.asarray(y_j), rtol=1e-6, atol=1e-6
    )

    # Packed [B, T, N, C]: flip is per-frame.
    xp = torch.randn(1, 4, 6, dim, generator=g)
    with torch.no_grad():
        yp_t, _ = orf(xp)
    yp_j, _ = jrf(params, jnp.asarray(xp.numpy()))
    assert yp_j.shape == tuple(yp_t.shape)
    assert rel_err(yp_j, yp_t.numpy()) < 1e-4

    # Streaming: only the fwd state carries; chunk 2 outputs must match.
    with torch.no_grad():
        _, s1_t = orf(x[:, :12])
        y2_t, _ = orf(x[:, 12:], state_fwd=s1_t)
    _, s1_j = jrf(params, jnp.asarray(x[:, :12].numpy()))
    y2_j, _ = jrf(params, jnp.asarray(x[:, 12:].numpy()), state_fwd=s1_j)
    assert rel_err(y2_j, y2_t.numpy()) < 1e-4


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


@pytest.mark.parametrize("use_fast_path", [False, True])
def test_ssm_only_streaming_parity_through_bridge(tmp_path, use_fast_path):
    """Streaming via bare ssm-only states (init_ssm_state): the reference
    advances the caller's tensors in place (mamba_simple.py:427-439) so
    chunk 2 sees chunk 1's state; our functional equivalent must produce the
    same per-chunk outputs AND the same advanced states. Covers both the
    unfused and fast-path routes (both lower to the chunked XLA scan on
    CPU; the Pallas kernels are tied to the same oracle by the
    interpret-mode scan test above)."""
    oracle, model = make_pair(tmp_path, pool_type="avg",
                              use_fast_path=use_fast_path)
    x = video(frames=8)

    st_t = [blk.mixer.allocate_state(2)[1] for blk in oracle.layers]
    st_j = model.init_ssm_state(batch_size=2)
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
        for sj, st_torch in zip(st_j, st_t):
            assert rel_err(sj, st_torch.numpy()) < 1e-4
        offset += 4


# ------------------------------------------- driver-scale / bf16 golden bars

DRIVER_GEOM = dict(img_size=224, patch_size=16, depth=4, embed_dim=192,
                   channels=3, kernel_size=1, num_frames=8)


@pytest.mark.slow
def test_driver_scale_streaming_parity(tmp_path):
    """Golden parity at a realistic geometry (Tiny-like embed 192, 224^2
    input, 196 tokens/frame, 2 streaming chunks) — the bars held at toy
    scale must hold where the driver measures: fp32 rel-err <= 2e-4 on
    per-chunk features and pooled outputs, states <= 1e-4."""
    oracle, model = make_pair(tmp_path, pool_type="avg", geom=DRIVER_GEOM)
    x = video(bsz=1, frames=8, hw=224, seed=31)

    st_t = oracle.allocate_state(1)
    st_j = model.allocate_state(1)
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


@pytest.mark.slow
def test_bf16_serving_preset_streaming_bar(tmp_path):
    """The driver's streaming-feature bar (BASELINE.md, <=1e-3 rel err) in
    the bf16 serving preset, at driver-like geometry.

    Two distinct claims, asserted separately:

    * STREAMING bar: stitched chunked features == the full-clip run of the
      same bf16 preset to <=1e-3 (measured 1.1e-4 at this geometry) — the
      carried (conv, ssm) state introduces no drift beyond chunk-boundary
      rounding. This is the quantity bench.py's bench_parity reports.
    * bf16 absolute accuracy vs the fp32 torch reference: bounded by bf16
      matmul accumulation (~2^-9/layer, random-walk over depth). Measured
      ~1.1e-2 max / 4e-3 mean rel at depth 4; asserted at 2e-2 max. An fp32
      run of the same model meets 2e-4 (test_driver_scale_streaming_parity)
      — the gap is bf16 quantization, not a semantics divergence.
    """
    oracle, model = make_pair(
        tmp_path, pool_type="avg", geom=DRIVER_GEOM, use_fast_path=True,
        jax_overrides={"dtype": jnp.bfloat16},
    )
    assert model.params["patch_embed"]["kernel"].dtype == jnp.bfloat16
    x = video(bsz=1, frames=8, hw=224, seed=33)
    xj = jnp.asarray(x.numpy(), jnp.bfloat16)

    with torch.no_grad():
        vis_t, _ = oracle(x)
    vis_full, _ = model(xj)

    st_j = model.allocate_state(1, dtype=jnp.bfloat16)
    c1, _, st_j = model(xj[:, :, :4], ssm_state=st_j, temporal_pos_offset=0)
    c2, _, st_j = model(xj[:, :, 4:], ssm_state=st_j, temporal_pos_offset=4)
    stitched = jnp.concatenate([c1, c2], axis=1)

    # Driver streaming bar, bf16 preset.
    assert rel_err(stitched, np.asarray(vis_full, np.float32)) < 1e-3
    # bf16 accumulation bound vs the fp32 torch reference.
    assert rel_err(vis_full, vis_t.numpy()) < 2e-2
    assert rel_err(stitched, vis_t.numpy()) < 2e-2


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
