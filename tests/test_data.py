"""Data helpers: mask generators satisfy the model contract; chunk iteration
stitches back to the full streaming run."""

from pathlib import Path

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


@pytest.mark.slow
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


# ---------------------------------------------------------------------------
# Dataset ingestion: file lists and class-directory layouts.
# ---------------------------------------------------------------------------

from videomamba_tpu.data.dataset import (  # noqa: E402
    load_file_list,
    make_clip_loader,
    scan_class_directories,
)


def _write_tree(tmp_path, classes=("jump", "run"), per_class=2, T=6, hw=20):
    from videomamba_tpu.data import native as nat

    rng = np.random.default_rng(0)
    for name in classes:
        d = tmp_path / name
        d.mkdir()
        for i in range(per_class):
            vid = rng.integers(0, 256, (T, hw, hw, 3), dtype=np.uint8)
            nat.write_vraw(d / f"clip{i}.vraw", vid)
    return tmp_path


def test_scan_class_directories(tmp_path):
    root = _write_tree(tmp_path)
    paths, labels, names = scan_class_directories(root)
    assert names == ["jump", "run"]  # sorted
    assert len(paths) == 4
    assert labels == [0, 0, 1, 1]
    assert all(p.endswith(".vraw") for p in paths)


def test_scan_class_directories_rejects_empty(tmp_path):
    (tmp_path / "empty_class").mkdir()
    with pytest.raises(ValueError, match="no clip files"):
        scan_class_directories(tmp_path)


def test_load_file_list(tmp_path):
    root = _write_tree(tmp_path)
    paths, labels, _ = scan_class_directories(root)
    lst = tmp_path / "train.txt"
    lines = ["# comment", ""]
    lines += [f"{p} {l}" for p, l in zip(paths[:2], labels[:2])]
    # comma-separated + relative-path forms
    rel = str(Path(paths[2]).relative_to(tmp_path))
    lines.append(f"{rel},{labels[2]}")
    lst.write_text("\n".join(lines))
    got_paths, got_labels = load_file_list(lst)
    assert got_labels == labels[:3]
    assert got_paths[2] == paths[2]  # relative resolved against list dir


def test_load_file_list_rejects_bad_lines(tmp_path):
    lst = tmp_path / "bad.txt"
    lst.write_text("just_a_path_no_label\n")
    with pytest.raises(ValueError, match="expected"):
        load_file_list(lst)
    lst.write_text("p.vraw notanint\n")
    with pytest.raises(ValueError, match="not an int"):
        load_file_list(lst)


@pytest.mark.skipif(
    not pytest.importorskip("videomamba_tpu.data.native").native_available(),
    reason="native loader unavailable",
)
def test_make_clip_loader_deterministic_batches(tmp_path):
    """Directory-layout ingestion feeds the native loader; (seed, epoch)
    fully determines batches (bit-exact across independent loaders)."""
    root = _write_tree(tmp_path, per_class=3, T=8, hw=24)
    kw = dict(clip_len=4, crop=16, batch_size=2, num_threads=3)

    loader1, n_cls = make_clip_loader(data_dir=root, train=True, **kw)
    loader2, _ = make_clip_loader(data_dir=root, train=True, **kw)
    assert n_cls == 2

    b1 = list(loader1.epoch(seed=7, shuffle=True, epoch=0))
    b2 = list(loader2.epoch(seed=7, shuffle=True, epoch=0))
    assert len(b1) == len(b2) > 0
    for (c1, l1), (c2, l2) in zip(b1, b2):
        np.testing.assert_array_equal(c1, c2)
        np.testing.assert_array_equal(l1, l2)
    assert {int(l) for _, ls in b1 for l in ls} <= {0, 1}
    loader1.close(); loader2.close()


def test_make_clip_loader_requires_exactly_one_source(tmp_path):
    with pytest.raises(ValueError, match="exactly one"):
        make_clip_loader()
    with pytest.raises(ValueError, match="exactly one"):
        make_clip_loader(data_dir=tmp_path, file_list=tmp_path / "x.txt")
