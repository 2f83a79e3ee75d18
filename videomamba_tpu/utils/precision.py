"""Mixed-precision policy: bf16 compute with fp32 master weights.

The reference delegates mixed precision to DeepSpeed's bf16/fp16 blocks
(utils/config_utils.py:130-148); here it is a pure function over the param
pytree, applied inside the loss so gradients flow back to the fp32 masters
(the cast's VJP is a cast back).

Leaves that must stay float32 for numerical fidelity keep their dtype — the
same set the initializer protects (A_log, D, dt_proj.bias, all norm scales/
biases); everything else (matmul kernels, embeddings, conv taps) casts to
the compute dtype. This matches the reference's fp32-residual/fp32-state
discipline: the selective scan and norms compute in fp32 internally
regardless of the storage dtype.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

# Path fragments that pin a leaf to float32 (mirrors Mamba.init /
# PretrainVideoMamba.init dtype policy).
_KEEP_FP32_SUFFIXES = ("A_log", "D", "dt_proj.bias")
_KEEP_FP32_SEGMENTS = (".norm.", "pool_norm")


def _keep_fp32(path: str) -> bool:
    if any(path.endswith(sfx) for sfx in _KEEP_FP32_SUFFIXES):
        return True
    padded = "." + path + "."
    return any(seg in padded for seg in _KEEP_FP32_SEGMENTS)


def cast_params_for_compute(params: Params, dtype=jnp.bfloat16) -> Params:
    """Cast matmul-bearing params to the compute dtype, keep fp32 criticals.

    Differentiable: use inside the loss function so the optimizer still sees
    float32 master parameters and full-precision gradients.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for kp, leaf in flat:
        path = ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in kp
        )
        if _keep_fp32(path) or leaf.dtype != jnp.float32:
            out.append(leaf)
        else:
            out.append(leaf.astype(dtype))
    return jax.tree_util.tree_unflatten(treedef, out)
