"""Data helpers: mask generators satisfy the model contract; chunk iteration
stitches back to the full streaming run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videomamba_tpu.data import (
    RandomMaskingGenerator,
    TubeMaskingGenerator,
    chunk_video,
    iter_video_chunks,
)
from videomamba_tpu.models import PretrainVideoMamba


def _small_model(**overrides):
    kwargs = dict(
        img_size=8, patch_size=4, depth=2, embed_dim=16, channels=3,
        ssm_cfg={"use_fast_path": False, "d_state": 8}, fused_add_norm=False,
        rms_norm=False, residual_in_fp32=False, kernel_size=1, num_frames=4,
    )
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


@pytest.mark.parametrize("gen_cls", [TubeMaskingGenerator, RandomMaskingGenerator])
def test_masks_satisfy_model_contract(gen_cls):
    gen = gen_cls((4, 2, 2), mask_ratio=0.5)
    masks = gen(batch_size=3, rng=np.random.default_rng(0))
    assert masks.shape == (3, 1 + 4 * 2 * 2)
    assert not masks[:, 0].any()                       # CLS visible
    visible = (~masks).sum(axis=1)
    assert (visible == visible[0]).all()               # equal counts

    model = _small_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 3, 4, 8, 8), jnp.float32)
    x_vis, x_pool = model(x, mask=masks)               # must not raise
    assert x_vis.shape[0] == 3


def test_tube_mask_is_temporally_constant():
    gen = TubeMaskingGenerator((4, 2, 2), mask_ratio=0.5)
    m = gen(1, rng=np.random.default_rng(1))[0, 1:].reshape(4, 4)
    for t in range(1, 4):
        np.testing.assert_array_equal(m[t], m[0])


def test_tube_mask_supports_keep_temporal_pooling():
    """Tube masks guarantee >=1 visible token per frame (ratio < 1)."""
    gen = TubeMaskingGenerator((4, 2, 2), mask_ratio=0.5)
    masks = gen(2, rng=np.random.default_rng(2))
    model = _small_model(pool_type="cls+avg")
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 3, 4, 8, 8), jnp.float32)
    _, x_pool = model(x, mask=masks, keep_temporal=True)
    assert x_pool.shape == (2, 4, model.embed_dim)


def test_chunk_video_alignment_and_truncation():
    assert list(chunk_video(8, 4)) == [(0, 4, 0), (4, 8, 4)]
    # tubelet 2: offsets are post-tubelet token counts, tail truncated.
    assert list(chunk_video(10, 4, tubelet_size=2)) == [
        (0, 4, 0), (4, 8, 2), (8, 10, 4)
    ]
    assert list(chunk_video(9, 4, tubelet_size=2)) == [
        (0, 4, 0), (4, 8, 2)
    ]
    with pytest.raises(ValueError, match="divisible"):
        list(chunk_video(8, 3, tubelet_size=2))


def test_iter_video_chunks_streams_to_full_equivalence():
    model = _small_model(add_pool_norm=False, num_frames=8)
    x = np.asarray(
        jax.random.normal(jax.random.PRNGKey(3), (1, 3, 8, 8, 8), jnp.float32)
    )
    full = model(jnp.asarray(x))

    state = model.init_state(batch_size=1)
    outs = []
    for chunk, offset in iter_video_chunks(x, chunk_frames=2):
        out, state = model(
            jnp.asarray(chunk), ssm_state=state, temporal_pos_offset=offset
        )
        outs.append(out)
    stitched = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(stitched), np.asarray(full), rtol=1e-4, atol=1e-4
    )
