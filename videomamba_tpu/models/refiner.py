"""BiMambaRefinerBlock — externally-composed bidirectionality.

Capability twin of /root/reference/models/refiner_backbone.py:13-135: two
independent unidirectional Blocks (forward + time-flipped backward), a
sigmoid fusion gate over their concatenation, and an output projection. Only
the forward direction's state streams across chunks; the backward pass is
per-chunk (its state is re-initialized every call), exactly like the
reference (:115-127).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from videomamba_tpu.models import initializers as init
from videomamba_tpu.models.block import Block, create_block

Array = jax.Array
Params = Dict[str, Any]
LayerState = Tuple[Array, Array]
PackedShape = Optional[Tuple[int, int, int]]


class BiMambaRefinerBlock:
    """Gated fwd/bwd fusion refiner over [B, L, C] or [B, T, N, C] tokens."""

    def __init__(
        self,
        dim: int,
        ssm_cfg: Optional[Dict[str, object]] = None,
        **block_kwargs,
    ):
        self.dim = dim
        layer_idx = block_kwargs.pop("layer_idx", None)
        self.block_fwd: Block = create_block(
            d_model=dim, ssm_cfg=ssm_cfg, layer_idx=layer_idx, bimamba=False,
            **block_kwargs,
        )
        # Distinct cache namespace for the backward block (refiner :33).
        bwd_layer_idx = None if layer_idx is None else int(layer_idx) + 1_000_000
        self.block_bwd: Block = create_block(
            d_model=dim, ssm_cfg=ssm_cfg, layer_idx=bwd_layer_idx, bimamba=False,
            **block_kwargs,
        )

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        gate_k, gate_b = init.torch_linear_default(k3, self.dim * 2, self.dim, True)
        out_k, out_b = init.torch_linear_default(k4, self.dim, self.dim, True)
        return {
            "block_fwd": self.block_fwd.init(k1, dtype=dtype),
            "block_bwd": self.block_bwd.init(k2, dtype=dtype),
            "fusion_gate": {"kernel": gate_k.astype(dtype), "bias": gate_b.astype(dtype)},
            "out_proj": {"kernel": out_k.astype(dtype), "bias": out_b.astype(dtype)},
        }

    @staticmethod
    def _pack_tokens(x: Array) -> Tuple[Array, PackedShape]:
        if x.ndim == 3:
            return x, None
        if x.ndim == 4:
            b, t, n, c = x.shape
            return x.reshape(b, t * n, c), (b, t, n)
        raise ValueError("Expected x to be [B, L, C] or [B, T, N, C].")

    @staticmethod
    def _unpack_tokens(x: Array, packed_shape: PackedShape) -> Array:
        if packed_shape is None:
            return x
        b, t, n = packed_shape
        return x.reshape(b, t, n, x.shape[-1])

    @staticmethod
    def _flip_time(x: Array, packed_shape: PackedShape) -> Array:
        """Flip along time: whole sequence for [B,L,C], frame axis for packed
        [B,T,N,C] (tokens within a frame keep their order, refiner :61-68)."""
        if packed_shape is None:
            return jnp.flip(x, axis=1)
        b, t, n = packed_shape
        return jnp.flip(x.reshape(b, t, n, x.shape[-1]), axis=1).reshape(
            b, t * n, x.shape[-1]
        )

    def allocate_state(
        self, batch_size: int, dtype=None
    ) -> Tuple[LayerState, LayerState]:
        fwd = self.block_fwd.mixer.allocate_state(batch_size, dtype=dtype)
        bwd = self.block_bwd.mixer.allocate_state(batch_size, dtype=dtype)
        return fwd, bwd

    def __call__(
        self,
        params: Params,
        x: Array,
        state_fwd: Optional[LayerState] = None,
        state_bwd_init: Optional[LayerState] = None,
        use_checkpoint: bool = False,
    ) -> Tuple[Array, LayerState]:
        """Returns (refined tokens, streamed forward state).

        ``use_checkpoint`` remats both inner Blocks (the reference threads it
        into torch.utils.checkpoint, refiner_backbone.py:97,112,126; here it
        is ``jax.checkpoint`` — activations are recomputed in the backward).
        """
        x_seq, packed_shape = self._pack_tokens(x)
        bsz = x_seq.shape[0]

        def run_fwd(p, xs, st):
            return self.block_fwd(p, xs, state=st, return_state=True)

        def run_bwd(p, xs, st):
            return self.block_bwd(p, xs, state=st, return_state=True)

        if use_checkpoint:
            run_fwd = jax.checkpoint(run_fwd)
            run_bwd = jax.checkpoint(run_bwd)

        if state_fwd is None:
            state_fwd = self.block_fwd.mixer.allocate_state(bsz, dtype=x_seq.dtype)
        out_fwd, _, new_state_fwd = run_fwd(
            params["block_fwd"], x_seq, tuple(state_fwd)
        )

        if state_bwd_init is None:
            state_bwd_init = self.block_bwd.mixer.allocate_state(bsz, dtype=x_seq.dtype)
        x_rev = self._flip_time(x_seq, packed_shape)
        out_bwd_rev, _, _ = run_bwd(
            params["block_bwd"], x_rev, tuple(state_bwd_init)
        )
        out_bwd = self._flip_time(out_bwd_rev, packed_shape)

        gate_in = jnp.concatenate([out_fwd, out_bwd], axis=-1)
        gate = jax.nn.sigmoid(
            gate_in @ params["fusion_gate"]["kernel"] + params["fusion_gate"]["bias"]
        )
        out = gate * out_fwd + (1.0 - gate) * out_bwd
        out = out @ params["out_proj"]["kernel"] + params["out_proj"]["bias"]
        return self._unpack_tokens(out, packed_shape), new_state_fwd
