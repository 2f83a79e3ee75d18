"""Optimizer factory — optax-native twin of /root/reference/utils/optimizer.py.

Reproduces the reference's parameter grouping semantics:
  * no weight decay for 1-D params and ``*.bias`` (filter_bias_and_bn),
  * no weight decay for names in ``model.no_weight_decay()`` and for the
    mixer's ``A_log``/``D`` (the reference marks these ``_no_weight_decay``),
  * regex-matched per-module different learning rate (``different_lr``),
  * sgd / momentum / adam / adamw.

Instead of torch param groups, grouping is expressed as optax masks over the
param pytree — the idiomatic JAX form, and it composes with sharded params
unchanged.
"""

from __future__ import annotations

import logging
import re
from typing import Any, Dict, Iterable, Optional

import jax
import optax

logger = logging.getLogger(__name__)

Params = Dict[str, Any]

# Param leaf names the reference tags with _no_weight_decay on the module
# (mamba_simple.py:273,277).
_NO_DECAY_LEAF_NAMES = ("A_log", "D")


def param_path_strings(params: Params):
    """Flat list of (path_string, leaf) with torch-ish dotted paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for key_path, leaf in flat:
        parts = [str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path]
        out.append((".".join(parts), leaf))
    return out


def _path_tree(params: Params):
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    paths = [
        ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        for key_path, _ in flat
    ]
    return paths, [leaf for _, leaf in flat], treedef


def weight_decay_mask(
    params: Params,
    no_decay_list: Iterable[str] = (),
    filter_bias_and_bn: bool = True,
) -> Params:
    """True = apply weight decay (reference add_weight_decay, optimizer.py:16-27)."""
    no_decay = set(no_decay_list)
    paths, leaves, treedef = _path_tree(params)
    mask = []
    for path, leaf in zip(paths, leaves):
        leaf_name = path.split(".")[-1]
        decay = True
        if filter_bias_and_bn and (leaf.ndim <= 1 or path.endswith(".bias")):
            decay = False
        elif any(path.endswith(n) or path == n for n in no_decay):
            decay = False
        if leaf_name in _NO_DECAY_LEAF_NAMES:
            decay = False
        # Model-level no-decay names (pos_embed etc.) match path heads too.
        head = path.split(".")[0]
        if head in no_decay:
            decay = False
        mask.append(decay)
    return jax.tree_util.tree_unflatten(treedef, mask)


def different_lr_mask(params: Params, diff_lr_names: Iterable[str]) -> Params:
    """True = use the alternate lr (regex match, reference optimizer.py:30-61)."""
    patterns = list(diff_lr_names)
    paths, leaves, treedef = _path_tree(params)
    mask = [
        any(re.search(pat, path) is not None for pat in patterns) for path in paths
    ]
    return jax.tree_util.tree_unflatten(treedef, mask)


def create_optimizer(
    args,
    model=None,
    params: Optional[Params] = None,
    filter_bias_and_bn: bool = True,
    learning_rate=None,
) -> optax.GradientTransformation:
    """Build the optimizer from an args/config namespace (optimizer.py:82-137).

    Recognized attrs: ``opt`` (sgd|nesterov|momentum|adam|adamw), ``lr``,
    ``weight_decay``, ``momentum``, ``opt_eps``, ``opt_betas``,
    ``different_lr.{enable,module_names,lr}``.

    ``learning_rate`` overrides ``args.lr`` and may be an optax schedule.
    """
    if params is None:
        if model is None:
            raise ValueError("Pass params (or a model holding .params).")
        params = model.params

    opt_lower = str(args.opt).lower().split("_")[-1]
    weight_decay = float(getattr(args, "weight_decay", 0.0))
    lr = learning_rate if learning_rate is not None else args.lr

    no_decay = set()
    if model is not None and hasattr(model, "no_weight_decay"):
        no_decay = set(model.no_weight_decay())
    wd_mask = weight_decay_mask(params, no_decay, filter_bias_and_bn)

    eps = getattr(args, "opt_eps", None)
    betas = getattr(args, "opt_betas", None)
    b1, b2 = (betas if betas is not None else (0.9, 0.999))

    def base_tx(scale_lr: float = 1.0):
        if callable(lr):
            sched = (lambda step: lr(step) * scale_lr) if scale_lr != 1.0 else lr
        else:
            sched = float(lr) * scale_lr
        if opt_lower in ("sgd", "nesterov"):
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=wd_mask),
                optax.sgd(sched, momentum=float(args.momentum), nesterov=True),
            )
        if opt_lower == "momentum":
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=wd_mask),
                optax.sgd(sched, momentum=float(args.momentum), nesterov=False),
            )
        if opt_lower == "adam":
            return optax.chain(
                optax.add_decayed_weights(weight_decay, mask=wd_mask),
                optax.adam(sched, b1=b1, b2=b2, eps=eps if eps is not None else 1e-8),
            )
        if opt_lower == "adamw":
            return optax.adamw(
                sched, b1=b1, b2=b2, eps=eps if eps is not None else 1e-8,
                weight_decay=weight_decay, mask=wd_mask,
            )
        raise ValueError(f"Invalid optimizer: {args.opt!r}")

    diff_cfg = getattr(args, "different_lr", None)
    if diff_cfg is not None and getattr(diff_cfg, "enable", False):
        diff_mask = different_lr_mask(params, diff_cfg.module_names)
        base_lr_val = args.lr if not callable(args.lr) else 1.0
        scale = float(diff_cfg.lr) / float(base_lr_val) if base_lr_val else 1.0
        labels = jax.tree_util.tree_map(
            lambda is_diff: "diff" if is_diff else "default", diff_mask
        )
        return optax.multi_transform(
            {"default": base_tx(1.0), "diff": base_tx(scale)}, labels
        )
    return base_tx(1.0)
