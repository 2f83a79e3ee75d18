"""Prenorm residual Block: Add -> Norm -> Mixer.

Structural twin of the reference ``Block``
(/root/reference/models/videomamba/videomamba.py:87-253): the block takes
(hidden, residual), adds them, normalizes, runs the mixer, and returns the
mixer output together with the post-add residual — the layout that lets the
add and the norm fuse into one kernel. ``fused_add_norm`` selects the fused
implementation (one Pallas/VPU pass) vs. the two-step composition; both are
numerically identical here because the unfused path also computes in float32.

Activation recomputation (the reference's torch.utils.checkpoint wrapping,
videomamba.py:168-206) maps to ``jax.checkpoint`` applied by the caller
around :meth:`Block.__call__` — see PretrainVideoMamba ``checkpoint_num``.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from videomamba_tpu.models.mamba import Mamba
from videomamba_tpu.ops.norm import fused_add_norm

Array = jax.Array
Params = Dict[str, Any]
LayerState = Tuple[Array, Array]


def drop_path(key: Optional[Array], x: Array, rate: float, deterministic: bool) -> Array:
    """Stochastic depth (timm DropPath semantics, scale_by_keep=True)."""
    if deterministic or rate == 0.0:
        return x
    if key is None:
        raise ValueError("drop_path with rate > 0 in training mode needs a PRNG key.")
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, (x.shape[0],) + (1,) * (x.ndim - 1))
    return x * (mask.astype(x.dtype) / keep)


@dataclasses.dataclass(frozen=True)
class Block:
    """Add -> Norm -> Mamba block with carried residual and streaming state."""

    dim: int
    mixer: Mamba
    norm_type: str = "layer"  # "layer" | "rms"
    norm_epsilon: float = 1e-5
    fused_add_norm: bool = False
    residual_in_fp32: bool = False
    drop_path_rate: float = 0.0
    layer_idx: Optional[int] = None

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        k_mixer, _ = jax.random.split(key)
        norm: Params = {"weight": jnp.ones((self.dim,), jnp.float32)}
        if self.norm_type == "layer":
            norm["bias"] = jnp.zeros((self.dim,), jnp.float32)
        return {"mixer": self.mixer.init(k_mixer, dtype=dtype), "norm": norm}

    def __call__(
        self,
        params: Params,
        hidden_states: Array,
        residual: Optional[Array] = None,
        state: Optional[LayerState] = None,
        return_state: bool = False,
        ssm_state: Optional[Array] = None,
        drop_path_key: Optional[Array] = None,
        deterministic: bool = True,
        inference_params=None,
    ) -> Union[Tuple[Array, Array], Tuple[Array, Array, LayerState]]:
        """Returns (hidden, residual) or (hidden, residual, new_state).

        Matches the reference forward contract (videomamba.py:121-246):
        ``residual`` is the running pre-norm sum; drop-path is applied to the
        incoming hidden states only when a residual exists (never on the
        first block's raw embedding).
        """
        if state is not None and ssm_state is not None:
            raise ValueError("Pass either state or ssm_state, not both.")

        dropped = (
            drop_path(drop_path_key, hidden_states, self.drop_path_rate, deterministic)
            if residual is not None
            else hidden_states
        )
        normed, new_residual = fused_add_norm(
            dropped,
            params["norm"]["weight"],
            params["norm"].get("bias"),
            residual=residual,
            prenorm=True,
            residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_epsilon,
            norm_type=self.norm_type,
            use_pallas=self.fused_add_norm,
        )

        if state is not None:
            mixer_out = self.mixer(
                params["mixer"], normed, state=state, return_state=return_state
            )
            if return_state:
                hidden, new_state = mixer_out
                return hidden, new_residual, new_state
            return mixer_out, new_residual

        hidden = self.mixer(
            params["mixer"], normed, ssm_state=ssm_state,
            inference_params=inference_params,
        )
        return hidden, new_residual

    def allocate_state(self, batch_size: int, dtype=None) -> LayerState:
        return self.mixer.allocate_state(batch_size, dtype=dtype)

    def allocate_inference_cache(self, batch_size: int, max_seqlen: int = 1, dtype=None):
        return self.mixer.allocate_inference_cache(batch_size, max_seqlen, dtype=dtype)


def create_block(
    d_model: int,
    ssm_cfg: Optional[Dict[str, object]] = None,
    norm_epsilon: float = 1e-5,
    drop_path: float = 0.0,
    rms_norm: bool = True,
    residual_in_fp32: bool = True,
    fused_add_norm: bool = True,
    layer_idx: Optional[int] = None,
    bimamba: bool = True,
) -> Block:
    """Block factory (videomamba.py:256-291). Like the reference, the inner
    mixer is always unidirectional (``bimamba=False`` forced on the Mamba);
    bidirectionality is composed externally."""
    del bimamba  # accepted for config parity; mixer below is unidirectional
    ssm_cfg = dict(ssm_cfg or {})
    ssm_cfg.pop("bimamba", None)
    mixer = Mamba(d_model=d_model, layer_idx=layer_idx, bimamba=False, **ssm_cfg)
    return Block(
        dim=d_model,
        mixer=mixer,
        norm_type="rms" if rms_norm else "layer",
        norm_epsilon=norm_epsilon,
        fused_add_norm=fused_add_norm,
        residual_in_fp32=residual_in_fp32,
        drop_path_rate=drop_path,
        layer_idx=layer_idx,
    )
