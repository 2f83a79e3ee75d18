"""Device mesh + sharding rules — the XLA-collectives replacement for the
reference's NCCL/DeepSpeed distribution layer.

The reference ships DP scaffolding only: NCCL process groups, SLURM rank
wiring, ZeRO via DeepSpeed configs (/root/reference/utils/distributed.py:84-144,
utils/config_utils.py:45-93). The TPU-native design replaces all of it with
``jax.sharding``: pick a mesh, annotate parameter/batch shardings, and let
GSPMD insert the collectives over ICI.

Axes:
  dp    pure data parallelism (batch sharding, gradient psum)
  fsdp  ZeRO-3-style parameter sharding (also shards the batch); XLA
        all-gathers params per layer and reduce-scatters grads — the
        compiler-scheduled equivalent of DeepSpeed stage 3
  tp    tensor parallelism over d_inner (column-parallel in_proj/conv/dt,
        row-parallel x_proj/out_proj with automatic psum)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence

import numpy as np
import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Dict[str, Any]


def make_mesh(
    axis_sizes: Dict[str, int], devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """Create a named mesh, e.g. make_mesh({"dp": 2, "fsdp": 2, "tp": 2}).

    Axis order follows insertion order; sizes must multiply to the device
    count. Lay the fastest-communicating axis (tp) last so it maps to the
    tightest ICI ring.
    """
    names = tuple(axis_sizes.keys())
    sizes = tuple(int(v) for v in axis_sizes.values())
    if devices is None:
        devices = jax.devices()
    n = int(np.prod(sizes))
    if n != len(devices):
        raise ValueError(
            f"Mesh size {n} ({dict(axis_sizes)}) != device count {len(devices)}."
        )
    dev_mesh = mesh_utils.create_device_mesh(sizes, devices=list(devices))
    return Mesh(dev_mesh, names)


def make_hybrid_mesh(
    axis_factors: Dict[str, "tuple[int, int]"],
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Multi-slice mesh: per-axis (dcn, ici) factors, e.g.
    ``make_hybrid_mesh({"dp": (2, 1), "fsdp": (1, 4), "tp": (1, 2)})`` for
    2 slices x 8 chips.

    Axes that cross slices (dcn factor > 1) should carry only
    low-bandwidth collectives — put dp (one gradient psum per step) on DCN
    and keep fsdp/tp all-gathers on ICI. Uses
    ``mesh_utils.create_hybrid_device_mesh`` when the device set spans
    multiple slices; on a single slice (or virtual CPU devices, which have
    no slice topology) it degrades to an ordinary mesh of the elementwise
    products, so the same config runs everywhere.
    """
    names = tuple(axis_factors.keys())
    dcn = tuple(int(v[0]) for v in axis_factors.values())
    ici = tuple(int(v[1]) for v in axis_factors.values())
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    num_slices = len({getattr(d, "slice_index", 0) for d in devices})
    if num_slices > 1:
        dev_mesh = mesh_utils.create_hybrid_device_mesh(
            ici, dcn, devices=devices
        )
        return Mesh(dev_mesh, names)
    total = {n: d * i for n, d, i in zip(names, dcn, ici)}
    return make_mesh(total, devices=devices)


def _axis_size(mesh: Mesh, name: str) -> int:
    return mesh.shape[name] if name in mesh.axis_names else 1


# Param-path-pattern -> PartitionSpec factory. Matched against "/"-joined
# pytree key paths (e.g. "layers/3/mixer/in_proj/kernel").
def _mixer_rules(fsdp: str, tp: str):
    return [
        (r"mixer/in_proj/kernel$", P(fsdp, tp)),     # (E, 2*Di) column-parallel
        (r"mixer/in_proj/bias$", P(tp)),
        (r"mixer/conv1d/weight$", P(None, tp)),      # (W, Di)
        (r"mixer/conv1d/bias$", P(tp)),
        (r"mixer/x_proj/kernel$", P(tp, None)),      # (Di, R+2N) row-parallel
        (r"mixer/dt_proj/kernel$", P(None, tp)),     # (R, Di)
        (r"mixer/dt_proj/bias$", P(tp)),
        (r"mixer/A_log$", P(tp, None)),              # (Di, N)
        (r"mixer/D$", P(tp)),
        (r"mixer/out_proj/kernel$", P(tp, fsdp)),    # (Di, E) row-parallel
        (r"mixer/out_proj/bias$", P()),
        (r"patch_embed/kernel$", P(None, fsdp)),
        (r"patch_embed/bias$", P()),
    ]


def param_shardings(
    params: Params,
    mesh: Mesh,
    fsdp_axis: str = "fsdp",
    tp_axis: str = "tp",
) -> Params:
    """NamedShardings for every parameter.

    Mixer matmul weights get explicit TP/FSDP specs (rules above); everything
    else (norms, positional embeddings, cls token) is replicated — they are
    tiny. A spec axis is dropped when the param dim is not divisible by the
    mesh axis (so the same rules work for toy test models).
    """
    fsdp = fsdp_axis if _axis_size(mesh, fsdp_axis) > 1 else None
    tp = tp_axis if _axis_size(mesh, tp_axis) > 1 else None
    rules = _mixer_rules(fsdp, tp)

    def spec_for(path: str, leaf) -> NamedSharding:
        spec = P()
        for pattern, candidate in rules:
            if re.search(pattern, path):
                spec = candidate
                break
        # Drop axes that do not divide the corresponding dim.
        fixed = []
        for dim, axis in enumerate(spec):
            if axis is None:
                fixed.append(None)
                continue
            size = _axis_size(mesh, axis)
            if dim < leaf.ndim and leaf.shape[dim] % size == 0:
                fixed.append(axis)
            else:
                fixed.append(None)
        fixed = fixed[: leaf.ndim]
        return NamedSharding(mesh, P(*fixed))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for key_path, leaf in flat:
        path = "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in key_path)
        out.append(spec_for(path, leaf))
    return jax.tree_util.tree_unflatten(treedef, out)


def batch_sharding(mesh: Mesh, *data_axes: str) -> NamedSharding:
    """Batch-dim sharding over the data axes (dp and fsdp both carry data)."""
    axes = tuple(a for a in (data_axes or ("dp", "fsdp")) if _axis_size(mesh, a) > 1)
    if not axes:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(axes))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params(params: Params, mesh: Mesh, **kw) -> Params:
    """Place params on the mesh according to :func:`param_shardings`."""
    return jax.device_put(params, param_shardings(params, mesh, **kw))
