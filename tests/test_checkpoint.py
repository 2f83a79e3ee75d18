"""Checkpoint bridge: torch round-trip, rejection rules, interpolation,
native save/load. Uses torch-cpu to write real .pt files."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.checkpoint import (
    load_params,
    load_state_dict,
    params_to_torch_state_dict,
    save_params,
    save_torch_state_dict,
)
from videomamba_tpu.models import PretrainVideoMamba

torch = pytest.importorskip("torch")


def _small_model(**overrides):
    kwargs = dict(
        img_size=8,
        patch_size=4,
        depth=2,
        embed_dim=16,
        channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8},
        fused_add_norm=False,
        rms_norm=False,
        residual_in_fp32=False,
        kernel_size=1,
        num_frames=4,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


@pytest.mark.slow
def test_torch_state_dict_round_trip(tmp_path):
    src = _small_model(rng=1)
    ckpt = tmp_path / "sd.pt"
    save_torch_state_dict(str(ckpt), src)

    dst = _small_model(rng=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 3, 4, 8, 8), jnp.float32)
    out_before = dst(x)[0]
    load_state_dict(str(ckpt), dst, ckpt_num_frame=4, num_frames=4)
    out_src = src(x)[0]
    out_after = dst(x)[0]
    assert not np.allclose(np.asarray(out_before), np.asarray(out_src))
    np.testing.assert_allclose(
        np.asarray(out_after), np.asarray(out_src), rtol=1e-6, atol=1e-6
    )


@pytest.mark.slow
def test_rejects_wrapped_checkpoint(tmp_path):
    model = _small_model()
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(model).items()
    }
    wrapped = tmp_path / "wrapped.pt"
    torch.save({"model": sd}, wrapped)
    with pytest.raises(ValueError, match="plain state_dict checkpoint"):
        load_state_dict(str(wrapped), model, ckpt_num_frame=4, num_frames=4)


def test_rejects_non_dict_checkpoint(tmp_path):
    path = tmp_path / "tensor.pt"
    torch.save(torch.ones(3), path)
    with pytest.raises(TypeError, match="plain state_dict"):
        load_state_dict(str(path), _small_model(), ckpt_num_frame=4, num_frames=4)


def test_missing_and_unexpected_keys_raise(tmp_path):
    model = _small_model()
    sd = {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in params_to_torch_state_dict(model).items()
    }
    incomplete = dict(sd)
    del incomplete["layers.0.mixer.A_log"]
    p1 = tmp_path / "missing.pt"
    torch.save(incomplete, p1)
    with pytest.raises(ValueError, match="Missing keys"):
        load_state_dict(str(p1), model, ckpt_num_frame=4, num_frames=4)

    extra = dict(sd)
    extra["bogus.weight"] = torch.ones(3)
    p2 = tmp_path / "extra.pt"
    torch.save(extra, p2)
    with pytest.raises(ValueError, match="Unexpected keys"):
        load_state_dict(str(p2), model, ckpt_num_frame=4, num_frames=4)


def test_ckpt_num_frame_required(tmp_path):
    model = _small_model()
    ckpt = tmp_path / "sd.pt"
    save_torch_state_dict(str(ckpt), model)
    with pytest.raises(ValueError, match="ckpt_num_frame"):
        load_state_dict(str(ckpt), model, ckpt_num_frame=None, num_frames=4)
    with pytest.raises(ValueError, match="ckpt_num_frame"):
        load_state_dict(str(ckpt), model, ckpt_num_frame=0, num_frames=4)


def test_spatial_interpolation_to_non_square_target(tmp_path):
    source = _small_model(img_size=8, rng=1)
    ckpt = tmp_path / "sq.pt"
    save_torch_state_dict(str(ckpt), source)

    target = _small_model(img_size=(8, 12), rng=2)
    load_state_dict(str(ckpt), target, ckpt_num_frame=4, num_frames=4)
    assert target.params["pos_embed"].shape == (1, 1 + (8 // 4) * (12 // 4), 16)

    # Interpolation matches torch F.interpolate bicubic exactly.
    import torch.nn.functional as F

    src_pos = np.asarray(source.params["pos_embed"], np.float32)
    patch = torch.from_numpy(src_pos[:, 1:]).reshape(1, 2, 2, 16).permute(0, 3, 1, 2)
    want = F.interpolate(patch, size=(2, 3), mode="bicubic", align_corners=False)
    want = want.permute(0, 2, 3, 1).reshape(1, 6, 16).numpy()
    got = np.asarray(target.params["pos_embed"][:, 1:], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_temporal_interpolation(tmp_path):
    source = _small_model(num_frames=4, rng=1)
    ckpt = tmp_path / "t4.pt"
    save_torch_state_dict(str(ckpt), source)

    target = _small_model(num_frames=8, rng=2)
    load_state_dict(str(ckpt), target, ckpt_num_frame=4, num_frames=8)
    assert target.params["temporal_pos_embedding"].shape == (1, 8, 16)

    import torch.nn.functional as F

    src_t = np.asarray(source.params["temporal_pos_embedding"], np.float32)
    want = F.interpolate(
        torch.from_numpy(src_t).permute(0, 2, 1), size=8, mode="linear",
        align_corners=False,
    ).permute(0, 2, 1).numpy()
    got = np.asarray(target.params["temporal_pos_embedding"], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_save_load_roundtrip(tmp_path):
    model = _small_model(rng=7)
    path = tmp_path / "params.msgpack"
    save_params(str(path), model.params)
    other = _small_model(rng=9)
    restored = load_params(str(path), other.params)
    flat_a = jax.tree_util.tree_leaves(model.params)
    flat_b = jax.tree_util.tree_leaves(restored)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_build_videomamba_with_pretrained(tmp_path):
    from types import SimpleNamespace

    from videomamba_tpu.models.videomamba import build_videomamba

    reference = _small_model(rng=4)
    ckpt = tmp_path / "mini.pt"
    save_torch_state_dict(str(ckpt), reference)

    cfg = SimpleNamespace(
        vision_encoder=SimpleNamespace(
            img_size=8, patch_size=4, depth=2, embed_dim=16, channels=3,
            drop_path_rate=0.0, ssm_cfg={"use_fast_path": False, "d_state": 8},
            norm_epsilon=1e-5, fused_add_norm=False, rms_norm=False,
            residual_in_fp32=False, bimamba=True, pool_type="cls+avg",
            kernel_size=1, num_frames=4, use_checkpoint=False, checkpoint_num=0,
            pretrained=str(ckpt), ckpt_num_frame=4,
        )
    )
    model = build_videomamba(cfg)
    assert isinstance(model, PretrainVideoMamba)
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 3, 4, 8, 8), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model(x)[0]), np.asarray(reference(x)[0]), rtol=1e-6, atol=1e-6
    )


# ---------------------------------------------------------------------------
# timm .npz loading (reference load_pretrained -> timm _load_weights subset).
# ---------------------------------------------------------------------------

def _timm_npz(tmp_path, grid=2, embed=16, patch=4, with_blocks=True):
    """Generate a tiny npz with timm _load_weights key names."""
    rng = np.random.default_rng(0)
    arrs = {
        "embedding/kernel": rng.normal(size=(patch, patch, 3, embed)).astype(np.float32),
        "embedding/bias": rng.normal(size=(embed,)).astype(np.float32),
        "cls": rng.normal(size=(1, 1, embed)).astype(np.float32),
        "Transformer/posembed_input/pos_embedding":
            rng.normal(size=(1, 1 + grid * grid, embed)).astype(np.float32),
        "Transformer/encoder_norm/scale": rng.normal(size=(embed,)).astype(np.float32),
        "Transformer/encoder_norm/bias": rng.normal(size=(embed,)).astype(np.float32),
    }
    if with_blocks:
        # ViT encoder blocks + head: no VideoMamba counterpart.
        arrs["Transformer/encoderblock_0/LayerNorm_0/scale"] = (
            np.ones(embed, np.float32))
        arrs["head/kernel"] = rng.normal(size=(embed, 10)).astype(np.float32)
    path = tmp_path / "vit.npz"
    np.savez(str(path), **arrs)
    return path, arrs


def _tiny_vit_model(num_frames=2, img=8):
    return PretrainVideoMamba(
        img_size=img, patch_size=4, depth=2, embed_dim=16, channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8}, fused_add_norm=False,
        rms_norm=False, residual_in_fp32=False, kernel_size=2,
        num_frames=num_frames, add_pool_norm=False, rng=0,
    )


def test_load_timm_npz_maps_vit_subset(tmp_path):
    from videomamba_tpu.checkpoint import load_timm_npz

    model = _tiny_vit_model()
    path, arrs = _timm_npz(tmp_path)
    with pytest.warns(UserWarning, match="encoderblock_0"):
        params = load_timm_npz(str(path), model)

    # Patch kernel: (p,p,C,E) -> transpose to (C,p,p,E), broadcast over the
    # tubelet axis divided by kt, flattened to (patch_dim, E).
    kt = model.patch_embed.tubelet_size
    k2d = np.transpose(arrs["embedding/kernel"], (2, 0, 1, 3))
    want = np.repeat(k2d[:, None], kt, axis=1).reshape(-1, 16) / kt
    np.testing.assert_allclose(np.asarray(params["patch_embed"]["kernel"]),
                               want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["patch_embed"]["bias"]),
                               arrs["embedding/bias"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["cls_token"]),
                               arrs["cls"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["pos_embed"]),
        arrs["Transformer/posembed_input/pos_embedding"], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params["norm"]["weight"]),
                               arrs["Transformer/encoder_norm/scale"], rtol=1e-6)

    # The tubelet-broadcast kernel must reproduce the 2D conv on a
    # frame-constant clip: summing kt identical frames / kt == 2D embed.
    x2d = np.random.default_rng(1).normal(
        size=(1, 3, 1, 8, 8)).astype(np.float32)
    clip = np.repeat(x2d, kt, axis=2)
    model.params = params
    toks = model.patch_embed(params["patch_embed"], jnp.asarray(clip))
    ref = np.einsum(
        "bchw,hwce->be",
        x2d[:, :, 0, :4, :4], arrs["embedding/kernel"],
    ) + arrs["embedding/bias"]
    np.testing.assert_allclose(np.asarray(toks[0, 0, 0]), ref[0],
                               rtol=1e-4, atol=1e-4)


def test_load_timm_npz_resamples_pos_grid(tmp_path):
    from videomamba_tpu.checkpoint import load_timm_npz
    from videomamba_tpu.ops.resample import cubic_resample_matrix

    model = _tiny_vit_model(img=8)             # model grid 2x2
    path, arrs = _timm_npz(tmp_path, grid=3, with_blocks=False)  # ckpt 3x3
    params = load_timm_npz(str(path), model, on_unmapped="error")

    pos = arrs["Transformer/posembed_input/pos_embedding"]
    grid_tokens = pos[:, 1:].reshape(1, 3, 3, 16)
    w = cubic_resample_matrix(3, 2)
    want = np.einsum("oh,bhwc->bowc", w, grid_tokens)
    want = np.einsum("pw,bowc->bopc", w, want).reshape(1, 4, 16)
    got = np.asarray(params["pos_embed"])
    np.testing.assert_allclose(got[:, :1], pos[:, :1], rtol=1e-6)
    np.testing.assert_allclose(got[:, 1:], want, rtol=1e-5, atol=1e-6)


def test_load_timm_npz_on_unmapped_error(tmp_path):
    from videomamba_tpu.checkpoint import load_timm_npz

    model = _tiny_vit_model()
    path, _ = _timm_npz(tmp_path, with_blocks=True)
    with pytest.raises(ValueError, match="no VideoMamba counterpart"):
        load_timm_npz(str(path), model, on_unmapped="error")
