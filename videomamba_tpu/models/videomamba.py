"""PretrainVideoMamba — the full video backbone, TPU-native.

Capability twin of /root/reference/models/videomamba/videomamba.py:371-1067,
redesigned for JAX/XLA rather than translated:

* **Patch embedding is one MXU matmul.** The reference's Conv3d has
  kernel == stride (videomamba.py:359-364), i.e. non-overlapping tubelets, so
  it is exactly a reshape + dense projection — the optimal TPU lowering (no
  conv layout plumbing, full MXU utilization).
* **Positional embeddings are resolved outside jit.** Runtime spatial
  re-gridding (bicubic) and temporal slicing/extrapolation (linear) are tiny
  host-dispatched ops computed per call (videomamba.py:621-675 semantics,
  bit-matched to PyTorch interpolate); the jit-compiled encoder core takes
  the resolved embeddings as plain array arguments. Consequence: streaming a
  long video with a growing ``temporal_pos_offset`` never recompiles — the
  core's signature is fixed per (chunk shape, has_cls) pair.
* **Streaming state is a fixed-shape pytree** threaded functionally through
  the core; chunk 0 (CLS, L+1 tokens) and continuation chunks (L tokens) are
  the two compiled specializations, by design.
* **Masking is host-validated, device-gathered.** The reference already
  requires equal visible counts per sample (videomamba.py:770-776) — exactly
  the static-shape contract jit needs; validation errors are raised eagerly
  on the host, the gather/pool run compiled.

Forward-return contract (frozen, streaming.py):
  add_pool_norm=True:  (x_vis, x_pool) | (x_vis, x_pool, next_state)
  add_pool_norm=False: x_vis | (x_vis, next_state)
"""

from __future__ import annotations

import logging
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import jax
import jax.numpy as jnp

from videomamba_tpu.models import initializers as init
from videomamba_tpu.models.block import Block, create_block
from videomamba_tpu.ops.norm import fused_add_norm
from videomamba_tpu.ops.resample import (
    infer_spatial_grid,
    resample_bicubic_2d,
)
from videomamba_tpu.streaming import (
    STREAMING_CONTRACT_VERSION,
    ForwardReturnSemantics,
    StateShape,
    forward_return_semantics as get_forward_return_semantics,
)

logger = logging.getLogger(__name__)

Array = jax.Array
Params = Dict[str, Any]
LayerState = Union[Array, Tuple[Array, Array]]
StateCollection = Union[List[LayerState], Tuple[LayerState, ...], Dict[int, LayerState]]


def _to_2tuple(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return int(v[0]), int(v[1])
    return int(v), int(v)


class PatchEmbed:
    """3D tubelet patchifier: video -> token grid, lowered as a single matmul.

    Parity surface of the reference PatchEmbed (videomamba.py:337-368):
    exposes ``img_size``, ``patch_size``, ``num_patches``, ``tubelet_size``.
    """

    def __init__(
        self,
        img_size: Union[int, Tuple[int, int]] = 224,
        patch_size: Union[int, Tuple[int, int]] = 16,
        kernel_size: int = 1,
        in_chans: int = 3,
        embed_dim: int = 768,
    ):
        self.img_size = _to_2tuple(img_size)
        self.patch_size = _to_2tuple(patch_size)
        self.num_patches = (self.img_size[1] // self.patch_size[1]) * (
            self.img_size[0] // self.patch_size[0]
        )
        self.tubelet_size = int(kernel_size)
        self.in_chans = int(in_chans)
        self.embed_dim = int(embed_dim)

    @property
    def patch_dim(self) -> int:
        return self.in_chans * self.tubelet_size * self.patch_size[0] * self.patch_size[1]

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        # PyTorch Conv3d default init; fan_in = C * k * p1 * p2.
        kernel, bias = init.torch_conv_default(
            key, (self.patch_dim, self.embed_dim), fan_in=self.patch_dim,
            bias_shape=(self.embed_dim,),
        )
        return {"kernel": kernel.astype(dtype), "bias": bias.astype(dtype)}

    def __call__(self, params: Params, x: Array) -> Array:
        """(B, C, T, H, W) -> (B, T', H'*W', E). T' = T // tubelet.

        Equivalent to Conv3d(kernel=stride=(tubelet, p, p)): rearrange each
        non-overlapping tubelet into a vector, then one dense projection.
        The feature order (c, kt, ph, pw) matches the flattened Conv3d
        weight layout, so the checkpoint bridge is a pure reshape.
        """
        bsz, c, t, h, w = x.shape
        kt = self.tubelet_size
        p1, p2 = self.patch_size
        gt, gh, gw = t // kt, h // p1, w // p2
        x = x.reshape(bsz, c, gt, kt, gh, p1, gw, p2)
        x = x.transpose(0, 2, 4, 6, 1, 3, 5, 7)  # (B, gt, gh, gw, c, kt, p1, p2)
        x = x.reshape(bsz, gt, gh * gw, self.patch_dim)
        return x @ params["kernel"] + params["bias"]


class PretrainVideoMamba:
    """VideoMamba encoder with streaming state, masking, and pooling heads.

    Holds static configuration plus a bound parameter pytree (``.params``);
    ``forward``/``__call__`` mirror the reference signature exactly. The pure
    compiled core is :meth:`apply` — use it directly inside your own jit/pjit
    if you manage params externally.
    """

    streaming_contract_version: str = STREAMING_CONTRACT_VERSION

    def __init__(
        self,
        img_size: Union[int, Tuple[int, int]] = 224,
        patch_size: int = 16,
        depth: int = 24,
        embed_dim: int = 192,
        channels: int = 3,
        drop_path_rate: float = 0.0,
        ssm_cfg: Optional[Dict[str, object]] = None,
        norm_epsilon: float = 1e-5,
        initializer_cfg: Optional[Dict[str, object]] = None,
        fused_add_norm: bool = True,
        rms_norm: bool = True,
        residual_in_fp32: bool = True,
        bimamba: bool = True,
        pool_type: str = "cls+avg",
        kernel_size: int = 1,
        num_frames: int = 8,
        device=None,
        dtype: Optional[jnp.dtype] = None,
        use_checkpoint: bool = False,
        checkpoint_num: int = 0,
        add_pool_norm: bool = True,
        rng: Optional[Union[int, Array]] = None,
        params: Optional[Params] = None,
    ):
        if not bimamba:
            raise NotImplementedError(
                "This minimal VideoMamba package only supports bimamba=True."
            )
        del device  # placement is explicit in JAX; kept for signature parity
        self.residual_in_fp32 = residual_in_fp32
        self.fused_add_norm = fused_add_norm
        self.use_checkpoint = use_checkpoint
        self.checkpoint_num = checkpoint_num
        self.depth = depth
        self.pool_type = pool_type
        self.d_model = self.num_features = self.embed_dim = embed_dim
        self.num_frames = num_frames
        self.norm_epsilon = norm_epsilon
        self.rms_norm = rms_norm
        self.drop_path_rate = drop_path_rate
        self.add_pool_norm = add_pool_norm
        self.param_dtype = jnp.float32 if dtype is None else dtype

        self.patch_embed = PatchEmbed(
            img_size=img_size,
            patch_size=patch_size,
            kernel_size=kernel_size,
            in_chans=channels,
            embed_dim=embed_dim,
        )

        dpr = [float(x) for x in np.linspace(0, drop_path_rate, depth)]
        inter_dpr = [0.0] + dpr
        self.layers: List[Block] = [
            create_block(
                embed_dim,
                ssm_cfg=ssm_cfg,
                norm_epsilon=norm_epsilon,
                rms_norm=rms_norm,
                residual_in_fp32=residual_in_fp32,
                fused_add_norm=fused_add_norm,
                layer_idx=i,
                bimamba=bimamba,
                drop_path=inter_dpr[i],
            )
            for i in range(depth)
        ]

        self._jit_cache: Dict[Any, Any] = {}
        if params is not None:
            self.params = params
        else:
            if rng is None:
                rng = 0
            key = jax.random.PRNGKey(rng) if isinstance(rng, int) else rng
            self.params = self.init(key, dtype=self.param_dtype)

    # ------------------------------------------------------------------ init

    def init(self, key: Array, dtype: jnp.dtype = jnp.float32) -> Params:
        """Initialize parameters following the reference's three init passes
        (videomamba.py:479-489): module defaults, then segm_init
        (trunc_normal 0.02 on Linear weights, zero biases — including
        dt_proj.bias, which segm_init zeroes before the _no_reinit guard can
        protect it), then the GPT-2 1/sqrt(n_layer) rescale of out_proj."""
        n_layer = self.depth
        keys = jax.random.split(key, self.depth + 3)
        params: Params = {}
        params["patch_embed"] = self.patch_embed.init(keys[0], dtype=dtype)
        params["cls_token"] = jnp.zeros((1, 1, self.embed_dim), dtype)
        params["pos_embed"] = init.trunc_normal(
            keys[1], (1, self.patch_embed.num_patches + 1, self.embed_dim), std=0.02
        ).astype(dtype)
        params["temporal_pos_embedding"] = jnp.zeros(
            (1, self.num_frames // self.patch_embed.tubelet_size, self.embed_dim), dtype
        )

        layer_params = []
        for i, block in enumerate(self.layers):
            bk = keys[2 + i]
            p = block.init(bk, dtype=dtype)
            sub = jax.random.split(bk, 6)
            mx: Params = p["mixer"]
            d_in = block.mixer.d_inner
            # segm_init: trunc_normal(0.02) all Linear weights, zero biases.
            mx["in_proj"]["kernel"] = init.trunc_normal(
                sub[0], mx["in_proj"]["kernel"].shape, 0.02
            ).astype(dtype)
            if "x_proj" in mx:  # Mamba-1 mixer (Mamba2 folds B/C/dt into in_proj)
                mx["x_proj"]["kernel"] = init.trunc_normal(
                    sub[1], mx["x_proj"]["kernel"].shape, 0.02
                ).astype(dtype)
                mx["dt_proj"]["kernel"] = init.trunc_normal(
                    sub[2], mx["dt_proj"]["kernel"].shape, 0.02
                ).astype(dtype)
                mx["dt_proj"]["bias"] = jnp.zeros_like(mx["dt_proj"]["bias"])
            # GPT-2 rescale: kaiming_uniform(a=sqrt(5)) / sqrt(n_layer).
            mx["out_proj"]["kernel"] = (
                init.kaiming_uniform(sub[3], mx["out_proj"]["kernel"].shape, fan_in=d_in)
                / np.sqrt(n_layer)
            ).astype(dtype)
            for name in ("in_proj", "out_proj"):
                if "bias" in mx[name]:
                    mx[name]["bias"] = jnp.zeros_like(mx[name]["bias"])
            layer_params.append(p)
        params["layers"] = layer_params

        params["norm"] = {"weight": jnp.ones((self.embed_dim,), jnp.float32)}
        if not self.rms_norm:
            params["norm"]["bias"] = jnp.zeros((self.embed_dim,), jnp.float32)
        if self.add_pool_norm:
            params["pool_norm"] = {
                "weight": jnp.ones((self.embed_dim,), jnp.float32),
                "bias": jnp.zeros((self.embed_dim,), jnp.float32),
            }
        return params

    # -------------------------------------------------------- state handling

    def _get_layer_state(
        self, state: Optional[StateCollection], layer_idx: int
    ) -> Optional[LayerState]:
        if state is None:
            return None
        if isinstance(state, dict):
            return state.get(layer_idx)
        if isinstance(state, (list, tuple)):
            return state[layer_idx]
        raise TypeError("state must be a list, tuple, or dict indexed by layer id")

    def allocate_state(
        self, batch_size: int, dtype=None, device=None, as_dict: bool = False
    ) -> StateCollection:
        """Per-layer streaming state (contract ``streaming_contract_version``)."""
        if as_dict:
            states_d = {
                idx: layer.mixer.allocate_state(batch_size, dtype=dtype)
                for idx, layer in enumerate(self.layers)
            }
            return jax.device_put(states_d, device) if device is not None else states_d
        states = [
            layer.mixer.allocate_state(batch_size, dtype=dtype) for layer in self.layers
        ]
        return jax.device_put(states, device) if device is not None else states

    def init_state(self, batch_size: int, dtype=None, device=None, as_dict: bool = False):
        """Backward-compatible alias for ``allocate_state``."""
        return self.allocate_state(batch_size, dtype=dtype, device=device, as_dict=as_dict)

    def init_ssm_state(
        self, batch_size: int, dtype=None, device=None, as_dict: bool = False
    ) -> Union[List[Array], Dict[int, Array]]:
        """SSM-only per-layer states (no conv context carried)."""
        def one(layer: Block) -> Array:
            _, ssm = layer.mixer.allocate_state(batch_size, dtype=dtype)
            return ssm

        if as_dict:
            states_d = {idx: one(layer) for idx, layer in enumerate(self.layers)}
            return jax.device_put(states_d, device) if device is not None else states_d
        states = [one(layer) for layer in self.layers]
        return jax.device_put(states, device) if device is not None else states

    def allocate_inference_cache(
        self, batch_size: int, max_seqlen: int = 1, dtype=None, **kwargs
    ) -> Dict[int, Tuple[Array, Array]]:
        return {
            i: layer.allocate_inference_cache(batch_size, max_seqlen, dtype=dtype)
            for i, layer in enumerate(self.layers)
        }

    def expected_state_shapes(self, batch_size: int) -> Dict[int, StateShape]:
        if batch_size <= 0:
            raise ValueError("batch_size must be a positive integer.")
        shapes: Dict[int, StateShape] = {}
        for idx, layer in enumerate(self.layers):
            m = layer.mixer
            state_shapes = getattr(m, "state_shapes", None)
            if callable(state_shapes):  # e.g. Mamba2's 4-D SSM state
                conv_shape, ssm_shape = state_shapes(batch_size)
                shapes[idx] = StateShape(
                    conv_state=tuple(conv_shape), ssm_state=tuple(ssm_shape)
                )
                continue
            shapes[idx] = StateShape(
                conv_state=(batch_size, m.d_inner, m.d_conv),
                ssm_state=(batch_size, m.d_inner, m.d_state),
            )
        return shapes

    def forward_return_semantics(self) -> ForwardReturnSemantics:
        return get_forward_return_semantics(self.add_pool_norm)

    def no_weight_decay(self):
        return {"pos_embed", "cls_token", "temporal_pos_embedding"}

    def get_num_layers(self) -> int:
        return len(self.layers)

    def load_pretrained(self, checkpoint_path: str, prefix: str = ""):
        """Load a timm-style .npz ViT checkpoint (videomamba.py:587-589)."""
        from videomamba_tpu.checkpoint import load_timm_npz

        self.params = load_timm_npz(checkpoint_path, self, prefix=prefix)

    # ----------------------------------------------- host-side shape helpers

    def _validate_temporal_length(self, frame_count: int) -> int:
        tubelet = self.patch_embed.tubelet_size
        if frame_count <= 0:
            raise ValueError("Input must contain at least one frame.")
        if frame_count % tubelet != 0:
            raise ValueError(
                f"Input frame count ({frame_count}) must be divisible by "
                f"tubelet size ({tubelet})."
            )
        return frame_count // tubelet

    def _spatial_token_grid(self, height: int, width: int) -> Tuple[int, int]:
        patch_h, patch_w = self.patch_embed.patch_size
        if height < patch_h or width < patch_w:
            raise ValueError(
                "Input spatial size must be at least one patch: "
                f"got ({height}, {width}) with patch size ({patch_h}, {patch_w})."
            )
        return height // patch_h, width // patch_w

    def _has_cls_token_for_forward(
        self, ssm_state: Optional[StateCollection], temporal_pos_offset: int
    ) -> bool:
        """CLS only in the first chunk of a full-state streaming run
        (videomamba.py:646-653)."""
        if ssm_state is None or temporal_pos_offset <= 0:
            return True
        layer_state = self._get_layer_state(ssm_state, 0)
        is_full_state = isinstance(layer_state, (list, tuple)) and len(layer_state) == 2
        return not is_full_state

    # ------------------------------------------- positional-embedding access

    def _get_spatial_pos_embedding(
        self, grid_h: int, grid_w: int, dtype, params: Optional[Params] = None
    ) -> Array:
        """Patch positional embeddings for a runtime grid; bicubic re-grid when
        it differs from the trained grid (videomamba.py:621-644)."""
        p = self.params if params is None else params
        patch_pos = p["pos_embed"][:, 1:]
        base_h = self.patch_embed.img_size[0] // self.patch_embed.patch_size[0]
        base_w = self.patch_embed.img_size[1] // self.patch_embed.patch_size[1]
        if base_h * base_w != patch_pos.shape[1]:
            base_h, base_w = infer_spatial_grid(patch_pos.shape[1], (base_h, base_w))
        if (grid_h, grid_w) == (base_h, base_w):
            return patch_pos.astype(dtype)
        pos = patch_pos.reshape(1, base_h, base_w, self.embed_dim)
        pos = resample_bicubic_2d(pos, (grid_h, grid_w))
        return pos.reshape(1, grid_h * grid_w, self.embed_dim).astype(dtype)

    def _get_temporal_pos_embedding(
        self, seqlen: int, offset: int, dtype, params: Optional[Params] = None
    ) -> Array:
        """Temporal pos-embed slice [offset, offset+seqlen); linearly
        extrapolated past the trained horizon (videomamba.py:655-675) — this
        is what makes minute-long streaming possible with an 8-frame-trained
        embedding. Computed host-side so jit never sees the offset."""
        if offset < 0:
            raise ValueError("temporal_pos_offset must be non-negative.")
        p = self.params if params is None else params
        pos_embed = p["temporal_pos_embedding"]
        pos_len = pos_embed.shape[1]
        end = offset + seqlen
        if end <= pos_len:
            return jax.lax.slice_in_dim(pos_embed, offset, end, axis=1).astype(dtype)
        # Beyond the trained horizon: resample to length `end` and slice. The
        # resample matrix is sliced host-side so the device matmul keeps a
        # FIXED (seqlen, pos_len) shape across all offsets — one compiled
        # program for the whole stream, no per-chunk recompiles.
        from videomamba_tpu.ops.resample import linear_resample_matrix

        m = linear_resample_matrix(pos_len, end)[offset:end]  # (seqlen, pos_len)
        pos = jnp.einsum(
            "ol,blc->boc", jnp.asarray(m), pos_embed.astype(jnp.float32),
            precision=jax.lax.Precision.HIGHEST,
        )
        return pos.astype(dtype)

    # --------------------------------------------------------------- masking

    def _normalize_mask(
        self,
        mask,
        batch_size: int,
        token_count: int,
        require_cls_visible: bool,
    ) -> Optional[np.ndarray]:
        """Host-side mask validation (videomamba.py:677-700). True = masked."""
        if mask is None:
            return None
        mask = np.asarray(mask)
        if mask.ndim != 2:
            raise ValueError("mask must be 2D with shape [B, N].")
        if mask.shape[0] != batch_size:
            raise ValueError(
                f"mask batch size mismatch: expected {batch_size}, got {mask.shape[0]}."
            )
        mask = mask.astype(bool)
        if mask.shape[1] != token_count:
            raise ValueError(
                f"mask token length mismatch: expected {token_count}, got {mask.shape[1]}."
            )
        if require_cls_visible and token_count > 0 and bool(mask[:, 0].any()):
            raise ValueError(
                "mask must keep CLS token visible (mask[:, 0] must be False)."
            )
        return mask

    def _visible_token_positions(
        self,
        mask,
        batch_size: int,
        token_count: int,
        require_cls_visible: bool,
    ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """Normalize mask and compute per-sample visible indices, host-side.

        Enforces the equal-visible-count contract (videomamba.py:770-776) —
        which is precisely what gives the compiled gather a static shape.
        """
        normalized = self._normalize_mask(
            mask, batch_size, token_count, require_cls_visible
        )
        if normalized is None:
            return None, None
        visible_mask = ~normalized
        visible_counts = visible_mask.sum(axis=1)
        if visible_counts.size > 0 and not (visible_counts == visible_counts[0]).all():
            raise ValueError(
                "mask must keep the same number of visible tokens per sample; "
                f"got per-sample counts: {visible_counts.tolist()}."
            )
        if visible_counts.size > 0 and int(visible_counts[0]) <= 0:
            raise ValueError("mask must keep at least one visible token per sample.")
        positions = np.arange(token_count)[None, :].repeat(batch_size, axis=0)
        positions = np.where(visible_mask, positions, token_count)
        num_visible = int(visible_counts[0]) if visible_counts.size > 0 else 0
        visible_positions = np.sort(positions, axis=1)[:, :num_visible]
        return normalized, visible_positions

    # ------------------------------------------------------------- jit cores

    def _encoder_core(
        self,
        params: Params,
        x: Array,
        spatial_pos: Array,
        temporal_pos: Array,
        visible_positions: Optional[Array],
        state: Optional[StateCollection],
        has_cls: bool,
        return_states: bool,
        deterministic: bool = True,
        rng: Optional[Array] = None,
    ):
        """Patchify -> pos-add -> (CLS) -> (gather) -> depth x Block -> norm.

        Pure function of its arguments; jitted via :meth:`_get_core`.
        """
        compute_dtype = params["patch_embed"]["kernel"].dtype
        x = x.astype(compute_dtype)
        tokens = self.patch_embed(params["patch_embed"], x)  # (B, T', HW, E)
        bsz = tokens.shape[0]
        tokens = tokens + spatial_pos.astype(compute_dtype)[:, None]
        tokens = tokens + temporal_pos.astype(compute_dtype)[:, :, None]
        tokens = tokens.reshape(bsz, -1, self.embed_dim)

        if has_cls:
            cls_tok = params["cls_token"] + params["pos_embed"][:, :1]
            cls_tok = jnp.broadcast_to(
                cls_tok.astype(compute_dtype), (bsz, 1, self.embed_dim)
            )
            tokens = jnp.concatenate([cls_tok, tokens], axis=1)

        if visible_positions is not None:
            tokens = jnp.take_along_axis(
                tokens, visible_positions[:, :, None], axis=1
            )

        hidden_states = tokens
        residual = None
        new_states: Optional[List[Optional[LayerState]]] = (
            [None] * self.depth if return_states else None
        )
        rngs = (
            list(jax.random.split(rng, self.depth + 1))
            if (rng is not None and not deterministic)
            else [None] * (self.depth + 1)
        )

        for idx, layer in enumerate(self.layers):
            layer_state = self._get_layer_state(state, idx)
            is_full = isinstance(layer_state, (list, tuple)) and len(layer_state) == 2

            def run_block(p, h, r, ls, _layer=layer, _full=is_full, _idx=idx):
                if _full:
                    return _layer(
                        p, h, residual=r, state=tuple(ls), return_state=True,
                        drop_path_key=rngs[_idx], deterministic=deterministic,
                    )
                if ls is not None:
                    # Bare ssm_state: the reference advances the caller's
                    # tensor in place (mamba_simple.py:427-439); the
                    # functional equivalent is returning the advanced array.
                    return _layer(
                        p, h, residual=r, ssm_state=ls, return_ssm_state=True,
                        drop_path_key=rngs[_idx], deterministic=deterministic,
                    )
                out_h, out_r = _layer(
                    p, h, residual=r,
                    drop_path_key=rngs[_idx], deterministic=deterministic,
                )
                return out_h, out_r, None

            if self.use_checkpoint and idx < self.checkpoint_num:
                run_block = jax.checkpoint(run_block, static_argnums=())

            hidden_states, residual, updated = run_block(
                params["layers"][idx], hidden_states, residual, layer_state
            )
            if new_states is not None:
                new_states[idx] = updated

        # Final norm, prenorm=False (videomamba.py:896-918).
        if not deterministic and self.drop_path_rate > 0.0 and rngs[-1] is not None:
            from videomamba_tpu.models.block import drop_path as _dp

            hidden_states = _dp(rngs[-1], hidden_states, self.drop_path_rate, False)
        hidden_states = fused_add_norm(
            hidden_states,
            params["norm"]["weight"],
            params["norm"].get("bias"),
            residual=residual,
            prenorm=False,
            residual_in_fp32=self.residual_in_fp32,
            eps=self.norm_epsilon,
            norm_type="rms" if self.rms_norm else "layer",
            use_pallas=self.fused_add_norm,
        )
        return hidden_states, new_states

    def _get_core(self, key: Tuple):
        """Cache of jitted encoder cores, keyed by the static call config
        PLUS the kernel-knob env fingerprint — flipping e.g.
        VIDEOMAMBA_BLOCK_PIPELINE mid-process re-traces instead of silently
        reusing the stale kernel (the in-process A/B pitfall)."""
        from videomamba_tpu.ops.dispatch import kernel_knob_fingerprint

        cache_key = key + (kernel_knob_fingerprint(),)
        if cache_key not in self._jit_cache:
            has_cls, return_states, masked, has_state, deterministic = key

            def fn(params, x, spatial_pos, temporal_pos, visible_positions, state, rng):
                return self._encoder_core(
                    params, x, spatial_pos, temporal_pos,
                    visible_positions if masked else None,
                    state if has_state else None,
                    has_cls=has_cls, return_states=return_states,
                    deterministic=deterministic, rng=rng,
                )

            self._jit_cache[cache_key] = jax.jit(fn)
        return self._jit_cache[cache_key]

    # ---------------------------------------------------------------- public

    def forward_features(
        self,
        x: Array,
        mask=None,
        use_image: bool = False,
        ssm_state: Optional[StateCollection] = None,
        temporal_pos_offset: int = 0,
        deterministic: bool = True,
        rng: Optional[Array] = None,
        params: Optional[Params] = None,
    ) -> Union[Array, Tuple[Array, StateCollection]]:
        """Encoder features; returns (x_vis, next_state) when state is passed.

        Mirrors videomamba.py:786-941 including container-type preservation
        (list/tuple/dict states come back in the same container). Pass
        ``params`` to run with explicit (possibly traced) parameters — the
        pure path used by training steps under jit/pjit.
        """
        p = self.params if params is None else params
        if x.ndim != 5:
            raise ValueError("x must have shape [B, C, T, H, W].")
        bsz = x.shape[0]
        t_tokens = self._validate_temporal_length(x.shape[2])
        grid_h, grid_w = self._spatial_token_grid(x.shape[-2], x.shape[-1])

        compute_dtype = p["patch_embed"]["kernel"].dtype
        spatial_pos = self._get_spatial_pos_embedding(
            grid_h, grid_w, compute_dtype, params=p
        )
        temporal_pos = self._get_temporal_pos_embedding(
            t_tokens, temporal_pos_offset, compute_dtype, params=p
        )

        has_cls = self._has_cls_token_for_forward(ssm_state, temporal_pos_offset)
        token_count = t_tokens * grid_h * grid_w + (1 if has_cls else 0)
        _, visible_positions = self._visible_token_positions(
            mask, bsz, token_count, require_cls_visible=has_cls
        )
        vis_arr = None if visible_positions is None else jnp.asarray(visible_positions)

        # Canonicalize state for the core; remember container type.
        state_list, container, any_full = self._canonicalize_state(ssm_state)

        has_state = state_list is not None
        core = self._get_core(
            (has_cls, has_state, vis_arr is not None, has_state, deterministic)
        )
        x_vis, new_states = core(
            p, x, spatial_pos, temporal_pos, vis_arr, state_list, rng
        )

        if new_states is not None:
            # Advanced states, same container type as passed in. For bare
            # ssm-only states this is the functional equivalent of the
            # reference's in-place ssm_state.copy_(last_state)
            # (mamba_simple.py:427-439) followed by returning the original
            # container (videomamba.py:930-941).
            out_state = self._repack_state(
                new_states, container, allow_missing=not any_full
            )
            return x_vis, out_state
        if ssm_state is None:
            return x_vis
        return x_vis, ssm_state

    def _canonicalize_state(self, ssm_state: Optional[StateCollection]):
        """State collection -> (list form, container tag, any_full_state)."""
        if ssm_state is None:
            return None, None, False
        if isinstance(ssm_state, dict):
            items = [ssm_state.get(i) for i in range(self.depth)]
            container = "dict"
        elif isinstance(ssm_state, (list, tuple)):
            items = list(ssm_state)
            container = "tuple" if isinstance(ssm_state, tuple) else "list"
        else:
            raise TypeError("state must be a list, tuple, or dict indexed by layer id")
        any_full = any(
            isinstance(s, (list, tuple)) and len(s) == 2 for s in items
        )
        # Normalize inner tuples for pytree stability.
        items = [tuple(s) if isinstance(s, (list, tuple)) else s for s in items]
        return items, container, any_full

    def _repack_state(
        self, states: List[LayerState], container: str, allow_missing: bool = False
    ) -> StateCollection:
        """Rebuild the caller's container from per-layer advanced states.

        ``allow_missing`` covers ssm-only collections where some layers have
        no state (e.g. a dict missing keys): those layers ran stateless in
        the reference too (videomamba.py:591-600 returns None, the layer is
        called without state), so the entry stays absent/None. Full-state
        collections must cover every layer (reference asserts the same).
        """
        if not allow_missing:
            for s in states:
                if s is None:
                    raise ValueError("Expected full state for all layers.")
        if container == "dict":
            return {i: s for i, s in enumerate(states) if s is not None}
        if container == "tuple":
            return tuple(states)
        return list(states)

    def forward(
        self,
        x: Array,
        mask=None,
        use_image: bool = False,
        keep_temporal: bool = False,
        ssm_state: Optional[StateCollection] = None,
        temporal_pos_offset: int = 0,
        deterministic: bool = True,
        rng: Optional[Array] = None,
        params: Optional[Params] = None,
    ):
        """Full forward with pooling head (videomamba.py:943-1067)."""
        if x.ndim != 5:
            raise ValueError("x must have shape [B, C, T, H, W].")
        grid_h, grid_w = self._spatial_token_grid(x.shape[-2], x.shape[-1])
        tokens_per_frame = grid_h * grid_w
        temporal_tokens = self._validate_temporal_length(x.shape[2])
        has_cls = self._has_cls_token_for_forward(ssm_state, temporal_pos_offset)

        features = self.forward_features(
            x, mask, use_image, ssm_state=ssm_state,
            temporal_pos_offset=temporal_pos_offset,
            deterministic=deterministic, rng=rng, params=params,
        )
        if ssm_state is None:
            x_vis = features
            next_state = None
        else:
            x_vis, next_state = features

        if not self.add_pool_norm:
            if ssm_state is None:
                return x_vis
            return x_vis, next_state

        cls_token = x_vis[:, :1] if has_cls else None
        patch_tokens = x_vis[:, 1:] if has_cls else x_vis
        cls_required = self.pool_type in {"cls", "cls+avg", "cls_cat_avg"}
        if cls_required and cls_token is None:
            raise ValueError(
                f"pool_type='{self.pool_type}' requires a CLS token, but "
                "continuation streaming chunks (temporal_pos_offset > 0 with "
                "full state) do not include CLS. Use pool_type='avg' for "
                "chunked streaming."
            )
        if self.pool_type != "cls" and patch_tokens.shape[1] == 0:
            raise ValueError(
                "mask must keep at least one patch token visible when using "
                f"pool_type='{self.pool_type}'."
            )

        x_pool = self._pool(
            cls_token, patch_tokens, mask, keep_temporal,
            temporal_tokens, tokens_per_frame, has_cls, x.shape[0], params=params,
        )

        if ssm_state is None:
            return patch_tokens, x_pool
        return patch_tokens, x_pool, next_state

    __call__ = forward

    def apply(self, params: Params, x: Array, **kwargs):
        """Pure functional forward with explicit params — the entry point for
        training steps and pjit callers that manage parameters externally."""
        return self.forward(x, params=params, **kwargs)

    def _pool(
        self,
        cls_token: Optional[Array],
        patch_tokens: Array,
        mask,
        keep_temporal: bool,
        temporal_tokens: int,
        tokens_per_frame: int,
        has_cls: bool,
        batch_size: int,
        params: Optional[Params] = None,
    ) -> Array:
        """Pooling head with pool_norm (videomamba.py:983-1057)."""
        p = self.params if params is None else params
        pn = p["pool_norm"]

        def pool_norm(v: Array) -> Array:
            from videomamba_tpu.ops.norm import layer_norm

            return layer_norm(v, pn["weight"], pn["bias"], eps=1e-5)

        if self.pool_type == "cls":
            assert cls_token is not None
            return pool_norm(cls_token)

        if keep_temporal:
            if mask is None:
                bsz, _, c = patch_tokens.shape
                temporal_avg = patch_tokens.reshape(
                    bsz, temporal_tokens, tokens_per_frame, c
                ).mean(axis=2)
            else:
                full_token_count = (
                    (1 if has_cls else 0) + temporal_tokens * tokens_per_frame
                )
                _, visible_positions = self._visible_token_positions(
                    mask, batch_size, full_token_count, require_cls_visible=has_cls
                )
                assert visible_positions is not None
                temporal_avg = self._masked_temporal_average(
                    patch_tokens, visible_positions, temporal_tokens,
                    tokens_per_frame, has_cls,
                )
        else:
            temporal_avg = patch_tokens.mean(axis=1, keepdims=True)

        if self.pool_type == "cls+avg":
            assert cls_token is not None
            return pool_norm(cls_token + temporal_avg)
        if self.pool_type == "cls_cat_avg":
            assert cls_token is not None
            return pool_norm(jnp.concatenate([cls_token, temporal_avg], axis=1))
        if self.pool_type == "avg":
            return pool_norm(temporal_avg)
        raise ValueError(f"Unsupported pool_type: {self.pool_type}")

    def _masked_temporal_average(
        self,
        patch_tokens: Array,
        visible_positions: np.ndarray,
        temporal_tokens: int,
        tokens_per_frame: int,
        has_cls: bool,
    ) -> Array:
        """Per-frame mean of visible patch tokens under arbitrary masking
        (videomamba.py:702-751), as a one-hot matmul (MXU-friendly
        segment-sum; no scatter)."""
        if patch_tokens.ndim != 3:
            raise ValueError("patch_tokens must have shape [B, N, C].")
        if visible_positions.ndim != 2:
            raise ValueError("visible_positions must have shape [B, N_total_visible].")
        if patch_tokens.shape[0] != visible_positions.shape[0]:
            raise ValueError(
                "Batch size mismatch between patch_tokens and visible_positions."
            )
        expected = patch_tokens.shape[1] + (1 if has_cls else 0)
        if visible_positions.shape[1] != expected:
            raise ValueError(
                "visible_positions and patch_tokens lengths are inconsistent."
            )
        if has_cls and visible_positions.size > 0 and not (
            visible_positions[:, 0] == 0
        ).all():
            raise ValueError("mask must keep CLS token visible for temporal pooling.")

        patch_positions = (
            visible_positions[:, 1:] - 1 if has_cls else visible_positions
        )
        frame_indices = patch_positions // tokens_per_frame  # host numpy

        counts = np.zeros((patch_tokens.shape[0], temporal_tokens), np.int64)
        for b in range(frame_indices.shape[0]):
            counts[b] = np.bincount(frame_indices[b], minlength=temporal_tokens)
        if (counts == 0).any():
            raise ValueError(
                "keep_temporal with masking requires at least one visible patch "
                "token for each temporal slice."
            )

        one_hot = jax.nn.one_hot(
            jnp.asarray(frame_indices), temporal_tokens, dtype=patch_tokens.dtype
        )  # (B, Nvis, T')
        temporal_sum = jnp.einsum("bvt,bvc->btc", one_hot, patch_tokens)
        return temporal_sum / jnp.asarray(counts, patch_tokens.dtype)[:, :, None]


def build_videomamba(config, add_pool_norm: bool = True) -> PretrainVideoMamba:
    """Model builder from a config namespace (videomamba.py:1150-1200).

    ``config.vision_encoder.channels`` is REQUIRED — attribute access raises
    AttributeError when absent (no ``in_chans`` fallback), per the reference
    checkpoint contract (README.md:88).
    """
    vision_cfg = config.vision_encoder
    channels = vision_cfg.channels
    model = PretrainVideoMamba(
        img_size=vision_cfg.img_size,
        patch_size=vision_cfg.patch_size,
        depth=vision_cfg.depth,
        embed_dim=vision_cfg.embed_dim,
        channels=channels,
        drop_path_rate=vision_cfg.drop_path_rate,
        ssm_cfg=vision_cfg.ssm_cfg,
        norm_epsilon=vision_cfg.norm_epsilon,
        fused_add_norm=vision_cfg.fused_add_norm,
        rms_norm=vision_cfg.rms_norm,
        residual_in_fp32=vision_cfg.residual_in_fp32,
        bimamba=vision_cfg.bimamba,
        pool_type=vision_cfg.pool_type,
        kernel_size=vision_cfg.kernel_size,
        num_frames=vision_cfg.num_frames,
        use_checkpoint=vision_cfg.use_checkpoint,
        checkpoint_num=vision_cfg.checkpoint_num,
        add_pool_norm=add_pool_norm,
    )
    pretrained_path = vision_cfg.pretrained
    if pretrained_path is not None:
        from videomamba_tpu.checkpoint import load_state_dict

        load_state_dict(
            pretrained_path=pretrained_path,
            model=model,
            ckpt_num_frame=vision_cfg.ckpt_num_frame,
            num_frames=vision_cfg.num_frames,
        )
    else:
        logger.info("No pretrained weights!!!")
    return model
