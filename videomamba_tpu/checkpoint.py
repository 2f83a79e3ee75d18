"""Checkpoint bridge: PyTorch state_dict <-> JAX params, plus native save/load.

Capability twin of the reference loader
(/root/reference/models/videomamba/videomamba.py:1070-1147) with the same
contract:

* plain-state_dict-only (rejects ``{"model": ...}`` / ``{"module": ...}``
  wrappers), ``weights_only=True`` with TypeError fallback;
* spatial pos-embed bicubic re-grid via aspect-ratio-closest factorization;
* temporal pos-embed linear resample driven by required ``ckpt_num_frame``;
* strict load (missing or unexpected keys raise).

Layout mapping (torch -> this framework):
  Linear ``weight (out, in)``        -> ``kernel (in, out)`` (transpose)
  Conv1d ``weight (D, 1, W)``        -> ``weight (W, D)``
  Conv3d ``weight (E, C, kt, p, p)`` -> ``kernel (C*kt*p*p, E)`` (flatten+T;
      flatten order (c, kt, ph, pw) matches PatchEmbed's tubelet vector)
  everything else                    -> unchanged

torch (CPU) is used only to *read* ``.pt`` files and is imported lazily;
no torch code runs on the compute path. Native checkpoints use flax
msgpack serialization (``save_params`` / ``load_params``).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import numpy as np
import jax.numpy as jnp

from videomamba_tpu.ops.resample import (
    cubic_resample_matrix,
    infer_spatial_grid,
    linear_resample_matrix,
)

logger = logging.getLogger(__name__)

Params = Dict[str, Any]


# --------------------------------------------------------------------- torch io

def _torch_load_plain_state_dict(pretrained_path: str) -> Dict[str, np.ndarray]:
    """Read a .pt checkpoint into numpy, enforcing the plain-dict contract."""
    try:
        import torch
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "Loading PyTorch checkpoints requires the torch package "
            "(CPU build is sufficient)."
        ) from exc
    try:
        checkpoint_model = torch.load(
            pretrained_path, map_location="cpu", weights_only=True
        )
    except TypeError:
        checkpoint_model = torch.load(pretrained_path, map_location="cpu")
    if not isinstance(checkpoint_model, dict):
        raise TypeError("Expected a plain state_dict (dict) checkpoint.")
    if "model" in checkpoint_model or "module" in checkpoint_model:
        raise ValueError(
            "Checkpoint wrapper keys ('model'/'module') are not supported. "
            "Pass a plain state_dict checkpoint."
        )
    out: Dict[str, np.ndarray] = {}
    for k, v in checkpoint_model.items():
        if not torch.is_tensor(v):
            raise TypeError(f"Checkpoint entry {k!r} is not a tensor.")
        out[k] = v.detach().to(torch.float32).cpu().numpy()
    return out


# ------------------------------------------------------ pos-embed interpolation

def _interp_pos_embed(
    sd: Dict[str, np.ndarray], model, ckpt_num_frame: Optional[int], num_frames: int
) -> Dict[str, np.ndarray]:
    """Spatial re-grid + temporal resample (videomamba.py:1086-1144)."""
    pos_embed_checkpoint = sd["pos_embed"]
    embedding_size = pos_embed_checkpoint.shape[-1]
    num_patches = model.patch_embed.num_patches
    num_extra_tokens = model.params["pos_embed"].shape[-2] - num_patches
    orig_token_count = pos_embed_checkpoint.shape[-2] - num_extra_tokens
    new_grid_h = model.patch_embed.img_size[0] // model.patch_embed.patch_size[0]
    new_grid_w = model.patch_embed.img_size[1] // model.patch_embed.patch_size[1]
    if new_grid_h * new_grid_w != num_patches:
        raise ValueError(
            "Model patch grid size mismatch: "
            f"{new_grid_h}x{new_grid_w} != num_patches({num_patches})."
        )
    orig_grid_h, orig_grid_w = infer_spatial_grid(
        orig_token_count, (new_grid_h, new_grid_w)
    )
    if (orig_grid_h, orig_grid_w) != (new_grid_h, new_grid_w):
        logger.info(
            "Position interpolate from %dx%d to %dx%d",
            orig_grid_h, orig_grid_w, new_grid_h, new_grid_w,
        )
        extra = pos_embed_checkpoint[:, :num_extra_tokens]
        pos_tokens = pos_embed_checkpoint[:, num_extra_tokens:].reshape(
            -1, orig_grid_h, orig_grid_w, embedding_size
        )
        wh = cubic_resample_matrix(orig_grid_h, new_grid_h)
        ww = cubic_resample_matrix(orig_grid_w, new_grid_w)
        pos_tokens = np.einsum("oh,bhwc->bowc", wh, pos_tokens)
        pos_tokens = np.einsum("pw,bowc->bopc", ww, pos_tokens)
        pos_tokens = pos_tokens.reshape(-1, new_grid_h * new_grid_w, embedding_size)
        sd = dict(sd)
        sd["pos_embed"] = np.concatenate([extra, pos_tokens], axis=1)

    temporal = sd["temporal_pos_embedding"]
    if ckpt_num_frame is None or ckpt_num_frame <= 0:
        raise ValueError(
            "ckpt_num_frame must be a positive integer when loading pretrained weights."
        )
    orig_t = ckpt_num_frame // model.patch_embed.tubelet_size
    new_t = num_frames // model.patch_embed.tubelet_size
    if orig_t != new_t:
        logger.info("Temporal interpolate from %d to %d", orig_t, new_t)
        wl = linear_resample_matrix(orig_t, new_t)
        sd = dict(sd)
        sd["temporal_pos_embedding"] = np.einsum("ol,blc->boc", wl, temporal)
    return sd


# ------------------------------------------------------------- name/layout map

def _torch_to_params(sd: Dict[str, np.ndarray], model) -> Params:
    """Map torch state_dict names/layouts onto the model's param pytree.

    Strict: every checkpoint key must be consumed and every model param must
    be covered, else raise (torch load_state_dict(strict=True) behavior).
    """
    import jax

    template = model.params
    remaining = dict(sd)
    missing = []

    def take(name: str) -> Optional[np.ndarray]:
        if name in remaining:
            return remaining.pop(name)
        missing.append(name)
        return None

    def assign(old, value: Optional[np.ndarray]):
        if value is None:
            return old
        if tuple(value.shape) != tuple(old.shape):
            raise ValueError(
                f"Shape mismatch: checkpoint {tuple(value.shape)} vs model "
                f"{tuple(old.shape)}."
            )
        return jnp.asarray(value, dtype=old.dtype)

    new: Params = jax.tree_util.tree_map(lambda x: x, template)  # shallow copy

    pe_w = take("patch_embed.proj.weight")
    if pe_w is not None:
        pe_w = pe_w.reshape(pe_w.shape[0], -1).T  # (E, C*kt*p*p) -> (patch_dim, E)
    new["patch_embed"]["kernel"] = assign(template["patch_embed"]["kernel"], pe_w)
    new["patch_embed"]["bias"] = assign(
        template["patch_embed"]["bias"], take("patch_embed.proj.bias")
    )
    for name in ("cls_token", "pos_embed", "temporal_pos_embedding"):
        new[name] = assign(template[name], take(name))

    for i, layer_tpl in enumerate(template["layers"]):
        pfx = f"layers.{i}."
        lp = new["layers"][i]
        lp["norm"]["weight"] = assign(layer_tpl["norm"]["weight"], take(pfx + "norm.weight"))
        if "bias" in layer_tpl["norm"]:
            lp["norm"]["bias"] = assign(layer_tpl["norm"]["bias"], take(pfx + "norm.bias"))
        mx_tpl = layer_tpl["mixer"]
        mx = lp["mixer"]
        mpfx = pfx + "mixer."

        def linear(dst_name: str, src_name: str):
            w = take(mpfx + src_name + ".weight")
            mx[dst_name]["kernel"] = assign(
                mx_tpl[dst_name]["kernel"], None if w is None else w.T
            )
            if "bias" in mx_tpl[dst_name]:
                mx[dst_name]["bias"] = assign(
                    mx_tpl[dst_name]["bias"], take(mpfx + src_name + ".bias")
                )

        linear("in_proj", "in_proj")
        cw = take(mpfx + "conv1d.weight")
        mx["conv1d"]["weight"] = assign(
            mx_tpl["conv1d"]["weight"], None if cw is None else cw[:, 0, :].T
        )
        if "bias" in mx_tpl["conv1d"]:
            mx["conv1d"]["bias"] = assign(
                mx_tpl["conv1d"]["bias"], take(mpfx + "conv1d.bias")
            )
        linear("x_proj", "x_proj")
        linear("dt_proj", "dt_proj")
        mx["A_log"] = assign(mx_tpl["A_log"], take(mpfx + "A_log"))
        mx["D"] = assign(mx_tpl["D"], take(mpfx + "D"))
        linear("out_proj", "out_proj")

    new["norm"]["weight"] = assign(template["norm"]["weight"], take("norm.weight"))
    if "bias" in template["norm"]:
        new["norm"]["bias"] = assign(template["norm"]["bias"], take("norm.bias"))
    if "pool_norm" in template:
        new["pool_norm"]["weight"] = assign(
            template["pool_norm"]["weight"], take("pool_norm.weight")
        )
        new["pool_norm"]["bias"] = assign(
            template["pool_norm"]["bias"], take("pool_norm.bias")
        )

    if missing:
        raise ValueError(f"Missing keys in checkpoint: {sorted(missing)}")
    if remaining:
        raise ValueError(f"Unexpected keys in checkpoint: {sorted(remaining)}")
    return new


def params_to_torch_state_dict(model) -> Dict[str, np.ndarray]:
    """Export the model's params as a torch-layout state_dict (numpy values).

    Inverse of :func:`_torch_to_params`; round-trips exactly.
    """
    p = model.params
    sd: Dict[str, np.ndarray] = {}

    def put(name, v):
        sd[name] = np.asarray(v, dtype=np.float32)

    kt = model.patch_embed.tubelet_size
    p1, p2 = model.patch_embed.patch_size
    c = model.patch_embed.in_chans
    e = model.patch_embed.embed_dim
    put(
        "patch_embed.proj.weight",
        np.asarray(p["patch_embed"]["kernel"], np.float32).T.reshape(e, c, kt, p1, p2),
    )
    put("patch_embed.proj.bias", p["patch_embed"]["bias"])
    put("cls_token", p["cls_token"])
    put("pos_embed", p["pos_embed"])
    put("temporal_pos_embedding", p["temporal_pos_embedding"])
    for i, lp in enumerate(p["layers"]):
        pfx = f"layers.{i}."
        put(pfx + "norm.weight", lp["norm"]["weight"])
        if "bias" in lp["norm"]:
            put(pfx + "norm.bias", lp["norm"]["bias"])
        mx = lp["mixer"]
        mpfx = pfx + "mixer."
        put(mpfx + "in_proj.weight", np.asarray(mx["in_proj"]["kernel"], np.float32).T)
        if "bias" in mx["in_proj"]:
            put(mpfx + "in_proj.bias", mx["in_proj"]["bias"])
        put(
            mpfx + "conv1d.weight",
            np.asarray(mx["conv1d"]["weight"], np.float32).T[:, None, :],
        )
        if "bias" in mx["conv1d"]:
            put(mpfx + "conv1d.bias", mx["conv1d"]["bias"])
        put(mpfx + "x_proj.weight", np.asarray(mx["x_proj"]["kernel"], np.float32).T)
        put(mpfx + "dt_proj.weight", np.asarray(mx["dt_proj"]["kernel"], np.float32).T)
        put(mpfx + "dt_proj.bias", mx["dt_proj"]["bias"])
        put(mpfx + "A_log", mx["A_log"])
        put(mpfx + "D", mx["D"])
        put(mpfx + "out_proj.weight", np.asarray(mx["out_proj"]["kernel"], np.float32).T)
        if "bias" in mx["out_proj"]:
            put(mpfx + "out_proj.bias", mx["out_proj"]["bias"])
    put("norm.weight", p["norm"]["weight"])
    if "bias" in p["norm"]:
        put("norm.bias", p["norm"]["bias"])
    if "pool_norm" in p:
        put("pool_norm.weight", p["pool_norm"]["weight"])
        put("pool_norm.bias", p["pool_norm"]["bias"])
    return sd


def save_torch_state_dict(path: str, model) -> None:
    """Write a reference-compatible .pt checkpoint (requires torch)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in
          params_to_torch_state_dict(model).items()}
    torch.save(sd, path)


# ---------------------------------------------------------------- public entry

def load_state_dict(pretrained_path: str, model, ckpt_num_frame: int, num_frames: int):
    """Load a reference PyTorch checkpoint into ``model.params`` (strict).

    Same rejection rules and interpolations as the reference loader
    (videomamba.py:1070-1147).
    """
    logger.info("Loading pretrained weights from %s", pretrained_path)
    sd = _torch_load_plain_state_dict(pretrained_path)
    sd = _interp_pos_embed(sd, model, ckpt_num_frame, num_frames)
    model.params = _torch_to_params(sd, model)
    logger.info("Loaded %d checkpoint tensors.", len(sd))


# ----------------------------------------------------------- native save/load

def save_params(path: str, params: Params) -> None:
    """Serialize a param pytree with flax msgpack (framework-native format)."""
    from flax import serialization

    with open(path, "wb") as f:
        f.write(serialization.to_bytes(params))


def load_params(path: str, template: Params) -> Params:
    """Deserialize params saved by :func:`save_params` onto a template pytree."""
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


def save_train_state(path: str, params: Params, opt_state, step) -> None:
    """Full training checkpoint: params + optimizer state + step counter.

    The reference defers optimizer-state/resume to DeepSpeed (SURVEY §5);
    here it is first-class: one msgpack blob, sharding-agnostic (arrays are
    gathered on save; re-shard with jax.device_put after load).
    """
    from flax import serialization

    state = {"params": params, "opt_state": opt_state, "step": step}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(state))


def load_train_state(path: str, params_template: Params, opt_state_template, step_template):
    """Restore a checkpoint written by :func:`save_train_state`."""
    from flax import serialization

    template = {
        "params": params_template,
        "opt_state": opt_state_template,
        "step": step_template,
    }
    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    return state["params"], state["opt_state"], state["step"]


def load_timm_npz(
    checkpoint_path: str,
    model,
    prefix: str = "",
    on_unmapped: str = "warn",
    num_prefix_tokens: Optional[int] = None,
) -> Params:
    """timm/ViT ``.npz`` loader (reference ``load_pretrained``,
    videomamba.py:587-589 delegating to timm ``_load_weights``).

    Only the ViT-compatible subset maps onto VideoMamba: patch embedding
    (2D conv broadcast over the tubelet axis), CLS token, positional
    embedding (bicubic re-grid when the checkpoint grid differs, following
    timm's ``resize_pos_embed``), and the final encoder norm. ViT
    transformer blocks, the classification head, and ``pre_logits`` have no
    Mamba counterpart — the reference's own timm path would fail on them at
    runtime, so this loader skips them and reports the skipped key groups
    per ``on_unmapped`` ("ignore" | "warn" | "error").
    """
    import warnings

    import jax

    w = np.load(checkpoint_path)
    params = jax.tree_util.tree_map(lambda x: x, model.params)
    consumed = set()

    def g(name):
        full = prefix + name
        if full in w:
            consumed.add(full)
            return w[full]
        return None

    emb = g("embedding/kernel")
    if emb is not None:
        # ViT conv kernel (p, p, C, E); broadcast over the tubelet axis.
        pdim = model.patch_embed.patch_dim
        e = model.patch_embed.embed_dim
        kt = model.patch_embed.tubelet_size
        # (p1, p2, C, E) -> (C, kt, p1, p2, E) / kt -> (patch_dim, E)
        k2d = np.transpose(emb, (2, 0, 1, 3))  # (C, p1, p2, E)
        k3d = np.repeat(k2d[:, None], kt, axis=1) / float(kt)
        params["patch_embed"]["kernel"] = jnp.asarray(
            k3d.reshape(pdim, e), model.params["patch_embed"]["kernel"].dtype
        )
        bias = g("embedding/bias")
        if bias is not None:
            params["patch_embed"]["bias"] = jnp.asarray(
                bias, model.params["patch_embed"]["bias"].dtype
            )
    cls = g("cls")
    if cls is not None:
        params["cls_token"] = jnp.asarray(cls, model.params["cls_token"].dtype)
    pos = g("Transformer/posembed_input/pos_embedding")
    if pos is not None:
        want = model.params["pos_embed"]
        if pos.shape != want.shape:
            # timm resize_pos_embed: keep prefix tokens, bicubic the grid.
            # The prefix-token count comes from the CHECKPOINT's layout;
            # pass num_prefix_tokens for non-standard checkpoints (e.g.
            # DeiT distillation tokens, or no CLS slot). Default: the
            # model's convention (one CLS slot), validated against the
            # checkpoint grid below instead of silently mis-slicing.
            extra = (
                num_prefix_tokens
                if num_prefix_tokens is not None
                else want.shape[-2] - model.patch_embed.num_patches
            )
            if not 0 <= extra <= pos.shape[-2]:
                raise ValueError(
                    f"timm npz: num_prefix_tokens={extra} out of range for a "
                    f"pos embedding with {pos.shape[-2]} tokens."
                )
            prefix_tok = pos[:, :extra]
            grid = pos[:, extra:]
            new_h = model.patch_embed.img_size[0] // model.patch_embed.patch_size[0]
            new_w = model.patch_embed.img_size[1] // model.patch_embed.patch_size[1]
            grid_count = grid.shape[-2]
            # A ViT grid is near-square: require a factorization within 2x
            # aspect of the model grid, else the prefix assumption is wrong
            # (e.g. a checkpoint without a CLS slot shifted by one token).
            old_h, old_w = infer_spatial_grid(grid_count, (new_h, new_w))
            ref_ratio = new_h / new_w
            if not (ref_ratio / 2 <= old_h / old_w <= ref_ratio * 2):
                raise ValueError(
                    f"timm npz: checkpoint grid of {grid_count} tokens (after "
                    f"stripping {extra} prefix tokens) only factorizes as "
                    f"{old_h}x{old_w}, implausible vs the model grid "
                    f"{new_h}x{new_w}. The checkpoint likely uses a different "
                    "prefix-token convention; pass num_prefix_tokens "
                    "explicitly."
                )
            grid = grid.reshape(-1, old_h, old_w, pos.shape[-1])
            wh = cubic_resample_matrix(old_h, new_h)
            ww = cubic_resample_matrix(old_w, new_w)
            grid = np.einsum("oh,bhwc->bowc", wh, grid)
            grid = np.einsum("pw,bowc->bopc", ww, grid)
            pos = np.concatenate(
                [prefix_tok, grid.reshape(1, new_h * new_w, pos.shape[-1])],
                axis=1,
            )
        params["pos_embed"] = jnp.asarray(pos, want.dtype)
    scale = g("Transformer/encoder_norm/scale")
    if scale is not None:
        params["norm"]["weight"] = jnp.asarray(scale, jnp.float32)
        bias = g("Transformer/encoder_norm/bias")
        if bias is not None and "bias" in params["norm"]:
            params["norm"]["bias"] = jnp.asarray(bias, jnp.float32)

    unmapped = sorted(
        {k.split("/")[0 if not k.startswith("Transformer/") else 1]
         for k in w.files if k not in consumed}
    )
    if unmapped and on_unmapped != "ignore":
        msg = (
            f"timm npz: skipped key groups with no VideoMamba counterpart: "
            f"{unmapped}"
        )
        if on_unmapped == "error":
            raise ValueError(msg)
        warnings.warn(msg, stacklevel=2)
    return params
