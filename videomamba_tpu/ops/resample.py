"""Positional-embedding resampling, bit-matched to PyTorch F.interpolate.

The reference resamples positional embeddings at runtime and checkpoint-load
time with ``torch.nn.functional.interpolate`` (bicubic for the spatial grid,
linear for the temporal axis, both align_corners=False):
/root/reference/models/videomamba/videomamba.py:621-644,655-675,1086-1144.

``jax.image.resize`` uses a different cubic kernel (Keys a=-0.5) than PyTorch
(cubic convolution a=-0.75), so to hit the <=1e-3 feature-parity bar we build
the interpolation as an explicit dense weight matrix reproducing PyTorch's
source-index math exactly. These matrices are tiny (pos-embed sized), built in
NumPy at trace time (static shapes), and applied as a single matmul — which is
also the fastest way to do it on TPU.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

Array = jax.Array

_CUBIC_A = -0.75  # PyTorch bicubic coefficient


def _cubic_conv1(t: np.ndarray, a: float) -> np.ndarray:
    return ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0


def _cubic_conv2(t: np.ndarray, a: float) -> np.ndarray:
    return ((a * t - 5.0 * a) * t + 8.0 * a) * t - 4.0 * a


@functools.lru_cache(maxsize=256)
def linear_resample_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) matrix matching F.interpolate(mode='linear',
    align_corners=False)."""
    m = np.zeros((out_len, in_len), dtype=np.float64)
    if in_len == out_len:
        np.fill_diagonal(m, 1.0)
        return m.astype(np.float32)
    scale = in_len / out_len
    for j in range(out_len):
        src = max((j + 0.5) * scale - 0.5, 0.0)
        i0 = int(math.floor(src))
        lam = src - i0
        i0 = min(i0, in_len - 1)
        i1 = min(i0 + 1, in_len - 1)
        m[j, i0] += 1.0 - lam
        m[j, i1] += lam
    return m.astype(np.float32)


@functools.lru_cache(maxsize=256)
def cubic_resample_matrix(in_len: int, out_len: int) -> np.ndarray:
    """(out_len, in_len) matrix matching one axis of
    F.interpolate(mode='bicubic', align_corners=False) (separable)."""
    m = np.zeros((out_len, in_len), dtype=np.float64)
    if in_len == out_len:
        np.fill_diagonal(m, 1.0)
        return m.astype(np.float32)
    scale = in_len / out_len
    for j in range(out_len):
        src = (j + 0.5) * scale - 0.5  # no clamp for cubic
        i = int(math.floor(src))
        t = src - i
        coeffs = (
            _cubic_conv2(np.float64(t + 1.0), _CUBIC_A),
            _cubic_conv1(np.float64(t), _CUBIC_A),
            _cubic_conv1(np.float64(1.0 - t), _CUBIC_A),
            _cubic_conv2(np.float64(2.0 - t), _CUBIC_A),
        )
        for k, c in enumerate(coeffs):
            idx = min(max(i - 1 + k, 0), in_len - 1)  # border replicate
            m[j, idx] += c
    return m.astype(np.float32)


def resample_linear_1d(x: Array, out_len: int) -> Array:
    """Resample (..., L, C) along L; float32 math, returns float32."""
    in_len = x.shape[-2]
    w = jnp.asarray(linear_resample_matrix(in_len, out_len))
    return jnp.einsum(
        "ol,...lc->...oc", w, x.astype(jnp.float32), precision=jax.lax.Precision.HIGHEST
    )


def resample_bicubic_2d(x: Array, out_hw: Tuple[int, int]) -> Array:
    """Resample (..., H, W, C) spatial grid; float32 math, returns float32.

    Separable cubic interpolation, identical to PyTorch's bicubic (which is
    itself separable with border-replicated taps).
    """
    in_h, in_w = x.shape[-3], x.shape[-2]
    out_h, out_w = out_hw
    wh = jnp.asarray(cubic_resample_matrix(in_h, out_h))
    ww = jnp.asarray(cubic_resample_matrix(in_w, out_w))
    hi = jax.lax.Precision.HIGHEST
    x32 = x.astype(jnp.float32)
    x32 = jnp.einsum("oh,...hwc->...owc", wh, x32, precision=hi)
    x32 = jnp.einsum("pw,...owc->...opc", ww, x32, precision=hi)
    return x32


def infer_spatial_grid(token_count: int, reference_grid: Tuple[int, int]) -> Tuple[int, int]:
    """Aspect-ratio-closest factorization of a token count into (H, W).

    Mirrors the reference's ``_infer_spatial_grid``
    (videomamba.py:32-55): among all factorizations h*w == token_count, pick
    the one minimizing (|h/w - ref_ratio|, |h-ref_h| + |w-ref_w|).
    """
    if token_count <= 0:
        raise ValueError("Position embedding must contain at least one spatial token.")
    ref_h, ref_w = reference_grid
    ref_ratio = float(ref_h) / float(ref_w)
    best_hw = None
    best_score = None
    for h in range(1, int(math.isqrt(token_count)) + 1):
        if token_count % h != 0:
            continue
        w = token_count // h
        for hh, ww in ((h, w), (w, h)):
            score = (
                abs((float(hh) / float(ww)) - ref_ratio),
                abs(hh - ref_h) + abs(ww - ref_w),
            )
            if best_score is None or score < best_score:
                best_score = score
                best_hw = (hh, ww)
    if best_hw is None:
        raise ValueError(f"Unable to infer spatial grid from token count {token_count}.")
    return best_hw
