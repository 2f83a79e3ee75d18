"""Pos-embed resampling vs torch.nn.functional.interpolate (the parity oracle).

torch (CPU build) is available in the environment and is the ground truth the
checkpoint/runtime interpolation must match bit-for-bit-ish (<=1e-5).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from videomamba_tpu.ops import infer_spatial_grid, resample_bicubic_2d, resample_linear_1d

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


@pytest.mark.parametrize("in_len,out_len", [(8, 16), (16, 8), (4, 7), (7, 4), (5, 5), (1, 3)])
def test_linear_matches_torch(in_len, out_len):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(1, in_len, 6)).astype(np.float32)
    got = np.asarray(resample_linear_1d(jnp.asarray(x), out_len))
    xt = torch.from_numpy(x).permute(0, 2, 1)  # (1, C, L)
    want = F.interpolate(xt, size=out_len, mode="linear", align_corners=False)
    want = want.permute(0, 2, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((4, 4), (7, 7)), ((7, 5), (4, 4)), ((14, 14), (16, 12)), ((2, 3), (5, 2)), ((3, 3), (3, 3))],
)
def test_bicubic_matches_torch(in_hw, out_hw):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1,) + in_hw + (5,)).astype(np.float32)
    got = np.asarray(resample_bicubic_2d(jnp.asarray(x), out_hw))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # (1, C, H, W)
    want = F.interpolate(xt, size=out_hw, mode="bicubic", align_corners=False)
    want = want.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_infer_spatial_grid_square_and_rect():
    assert infer_spatial_grid(196, (14, 14)) == (14, 14)
    assert infer_spatial_grid(6, (2, 3)) == (2, 3)
    assert infer_spatial_grid(6, (3, 2)) == (3, 2)
    with pytest.raises(ValueError):
        infer_spatial_grid(0, (1, 1))
