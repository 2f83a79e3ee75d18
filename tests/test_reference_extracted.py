"""Golden tests whose expected values come from the REFERENCE'S OWN CODE.

Like test_reference_golden._load_reference_scan, the pure-torch helper
functions of /root/reference/models/videomamba/videomamba.py are extracted
from the source AST at test time and executed (the module itself cannot be
imported off-GPU: mamba_ssm triton imports fail) — nothing is vendored.
This removes the builder-reimplemented-oracle common mode for:

* ``_infer_spatial_grid``            (videomamba.py:32-55)
* ``_get_spatial_pos_embedding``     (videomamba.py:621-644, bicubic)
* ``_get_temporal_pos_embedding``    (videomamba.py:655-675, linear extrap)
* ``_masked_temporal_average``       (videomamba.py:702-751, scatter-mean)

Bar: 1e-5 for the pure resampling math (fp32 both sides), exact for the
grid search, 1e-6 for the masked mean.
"""

import ast
import math
import os
from types import SimpleNamespace
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

REFERENCE_VIDEOMAMBA = "/root/reference/models/videomamba/videomamba.py"

reference_available = pytest.mark.skipif(
    not os.path.exists(REFERENCE_VIDEOMAMBA),
    reason="reference checkout not present",
)


def _extract_reference_fns(names, class_name="PretrainVideoMamba"):
    """Extract module-level functions and/or methods of ``class_name`` by
    name from the reference source and exec them in a torch namespace.

    Returns the namespace dict; methods are plain functions expecting a
    stub ``self`` carrying only the attributes they read.
    """
    with open(REFERENCE_VIDEOMAMBA) as f:
        tree = ast.parse(f.read())
    class_body = next(
        (n.body for n in tree.body
         if isinstance(n, ast.ClassDef) and n.name == class_name), []
    )
    fns = []
    for name in names:
        fn = next(
            (n for n in list(tree.body) + list(class_body)
             if isinstance(n, ast.FunctionDef) and n.name == name), None
        )
        assert fn is not None, f"{name} not found in reference source"
        fns.append(fn)
    ns: Dict[str, Any] = {
        "torch": torch, "math": math, "Tensor": torch.Tensor,
        "Optional": Optional, "Tuple": Tuple, "Union": Union,
        "List": List, "Dict": Dict, "Any": Any,
        # Type aliases used only in annotations:
        "StateCollection": object, "LayerState": object,
    }
    module = ast.Module(body=fns, type_ignores=[])
    exec(compile(module, REFERENCE_VIDEOMAMBA, "exec"), ns)
    return ns


# ---------------------------------------------------------------------------
# _infer_spatial_grid — exact equality over a sweep
# ---------------------------------------------------------------------------


@reference_available
def test_infer_spatial_grid_matches_reference_exactly():
    from videomamba_tpu.ops import infer_spatial_grid

    ref_fn = _extract_reference_fns(["_infer_spatial_grid"])[
        "_infer_spatial_grid"
    ]
    for ref_grid in [(14, 14), (16, 12), (7, 9), (1, 196)]:
        for count in list(range(1, 150)) + [196, 256, 384, 576]:
            assert infer_spatial_grid(count, ref_grid) == ref_fn(
                count, ref_grid
            ), (count, ref_grid)

    with pytest.raises(ValueError):
        infer_spatial_grid(0, (14, 14))
    with pytest.raises(ValueError):
        ref_fn(0, (14, 14))


# ---------------------------------------------------------------------------
# Pos-embed resampling — stub-self execution of the reference methods
# ---------------------------------------------------------------------------


def _tiny_model():
    from videomamba_tpu.models.videomamba import PretrainVideoMamba

    # base grid (64/16)^2 = 4x4; 2 temporal slots.
    return PretrainVideoMamba(
        img_size=64, patch_size=16, depth=1, embed_dim=32, num_frames=2,
        rng=0,
    )


def _ref_spatial_self(pos_embed_np, img_size=(64, 64), patch_size=(16, 16),
                      embed_dim=32):
    return SimpleNamespace(
        pos_embed=torch.from_numpy(pos_embed_np.copy()),
        patch_embed=SimpleNamespace(img_size=img_size, patch_size=patch_size),
        embed_dim=embed_dim,
    )


@reference_available
@pytest.mark.parametrize("grid", [(4, 4), (7, 7), (3, 5), (9, 2)])
def test_spatial_pos_embedding_matches_reference(grid):
    """Passthrough + bicubic re-grid paths, expected values computed by the
    reference's own ``_get_spatial_pos_embedding`` on identical weights."""
    ns = _extract_reference_fns(
        ["_infer_spatial_grid", "_get_spatial_pos_embedding"]
    )
    model = _tiny_model()
    pos = np.asarray(model.params["pos_embed"], np.float32)  # (1, 17, 32)

    want = ns["_get_spatial_pos_embedding"](
        _ref_spatial_self(pos), *grid, dtype=torch.float32,
        device=torch.device("cpu"),
    ).numpy()
    got = np.asarray(
        model._get_spatial_pos_embedding(*grid, dtype=jnp.float32)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@reference_available
def test_spatial_pos_embedding_inferred_grid_matches_reference():
    """Fallback path: pos_embed token count disagrees with the configured
    base grid, so both sides must infer (and agree on) the stored grid."""
    ns = _extract_reference_fns(
        ["_infer_spatial_grid", "_get_spatial_pos_embedding"]
    )
    model = _tiny_model()
    rng = np.random.default_rng(3)
    # 12 spatial tokens vs the configured 4x4=16: forces grid inference.
    pos = rng.normal(size=(1, 13, 32)).astype(np.float32)
    params = dict(model.params)
    params["pos_embed"] = jnp.asarray(pos)

    for grid in [(2, 6), (5, 4)]:
        want = ns["_get_spatial_pos_embedding"](
            _ref_spatial_self(pos), *grid, dtype=torch.float32,
            device=torch.device("cpu"),
        ).numpy()
        got = np.asarray(
            model._get_spatial_pos_embedding(
                *grid, dtype=jnp.float32, params=params
            )
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@reference_available
@pytest.mark.parametrize("seqlen,offset", [
    (2, 0),          # whole horizon, passthrough
    (1, 1),          # in-horizon slice
    (2, 2),          # entirely beyond the trained horizon
    (3, 1),          # straddles the horizon
    (6, 10),         # far extrapolation
])
def test_temporal_pos_embedding_matches_reference(seqlen, offset):
    ns = _extract_reference_fns(["_get_temporal_pos_embedding"])
    model = _tiny_model()
    tpe = np.asarray(model.params["temporal_pos_embedding"], np.float32)

    ref_self = SimpleNamespace(temporal_pos_embedding=torch.from_numpy(tpe))
    want = ns["_get_temporal_pos_embedding"](
        ref_self, seqlen, offset, dtype=torch.float32,
        device=torch.device("cpu"),
    ).numpy()
    got = np.asarray(
        model._get_temporal_pos_embedding(seqlen, offset, dtype=jnp.float32)
    )
    assert got.shape == want.shape == (1, seqlen, 32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Masked temporal average
# ---------------------------------------------------------------------------


def _random_visible_positions(rng, bsz, temporal, per_frame, keep, has_cls):
    """Sorted visible token positions with >=1 token per temporal slice."""
    rows = []
    for _ in range(bsz):
        vis = []
        for t in range(temporal):
            frame = np.arange(t * per_frame, (t + 1) * per_frame)
            take = rng.choice(per_frame, size=keep, replace=False)
            vis.append(frame[np.sort(take)])
        pos = np.concatenate(vis)
        if has_cls:
            pos = np.concatenate([[0], pos + 1])
        rows.append(pos)
    return np.stack(rows)


@reference_available
@pytest.mark.parametrize("has_cls", [True, False])
def test_masked_temporal_average_matches_reference(has_cls):
    ns = _extract_reference_fns(["_masked_temporal_average"])
    model = _tiny_model()
    rng = np.random.default_rng(11)
    bsz, temporal, per_frame, keep, dim = 2, 3, 8, 5, 32
    visible = _random_visible_positions(
        rng, bsz, temporal, per_frame, keep, has_cls
    )
    n_patches = visible.shape[1] - (1 if has_cls else 0)
    tokens = rng.normal(size=(bsz, n_patches, dim)).astype(np.float32)

    want = ns["_masked_temporal_average"](
        None,  # self: unused by the method body
        torch.from_numpy(tokens), torch.from_numpy(visible),
        temporal, per_frame, has_cls,
    ).numpy()
    got = np.asarray(
        model._masked_temporal_average(
            jnp.asarray(tokens), visible, temporal, per_frame, has_cls
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@reference_available
def test_masked_temporal_average_empty_slice_raises_in_both():
    ns = _extract_reference_fns(["_masked_temporal_average"])
    model = _tiny_model()
    rng = np.random.default_rng(12)
    # Frame 1 gets zero visible tokens.
    visible = np.asarray([[0, 1, 2, 17, 18]])  # cls + frame0 tokens + frame2
    tokens = rng.normal(size=(1, 4, 32)).astype(np.float32)

    with pytest.raises(ValueError, match="at least one visible"):
        ns["_masked_temporal_average"](
            None, torch.from_numpy(tokens), torch.from_numpy(visible),
            3, 8, True,
        )
    with pytest.raises(ValueError, match="at least one visible"):
        model._masked_temporal_average(
            jnp.asarray(tokens), visible, 3, 8, True
        )
