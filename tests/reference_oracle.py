"""CPU PyTorch oracle of the reference VideoMamba numerics.

The reference implementation (/root/reference/models/videomamba/) requires
CUDA (causal-conv1d / mamba-ssm kernels), so it cannot run in this image.
Its numerics, however, are fully specified by the in-tree pure-PyTorch scan
(`_selective_scan_ref`, mamba_simple.py:30-106), the causal-conv1d contract
(silu(depthwise causal conv)), the Block add->norm structure
(videomamba.py:87-253) and the encoder forward (videomamba.py:786-1067).

This module is an INDEPENDENT reimplementation of those semantics in plain
torch (CPU, fp32): same parameter names/shapes as the reference modules (so
`state_dict()` round-trips through the checkpoint bridge), same math, written
from the spec — not copied. It exists purely as a test oracle for
tests/test_reference_golden.py: golden numerical parity of the JAX framework
against reference semantics THROUGH the torch checkpoint format.

Layout note: the reference computes in (B, D, L); this oracle computes in
(B, L, D) wherever the math is layout-invariant, converting only where torch
modules require channel-first. The results are identical in fp32.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import torch
import torch.nn as nn
import torch.nn.functional as F


# --------------------------------------------------------------------- scan

def selective_scan_oracle(
    u: torch.Tensor,          # (B, L, D) conv output
    dt: torch.Tensor,         # (B, L, D) raw dt (pre-bias, pre-softplus)
    A: torch.Tensor,          # (D, N)
    B_ssm: torch.Tensor,      # (B, L, N)
    C_ssm: torch.Tensor,      # (B, L, N)
    D_skip: Optional[torch.Tensor] = None,   # (D,)
    z: Optional[torch.Tensor] = None,        # (B, L, D) gate
    dt_bias: Optional[torch.Tensor] = None,  # (D,)
    h0: Optional[torch.Tensor] = None,       # (B, D, N)
) -> Tuple[torch.Tensor, torch.Tensor]:
    """Sequential selective-scan with reference semantics.

    fp32 internals, softplus(dt + bias), h[t] = exp(dt*A)*h[t-1] + dt*B*u,
    y[t] = <h[t], C[t]>, D-skip, silu(z) gate; returns (y (B,L,D) in the
    input dtype, h_last (B,D,N) fp32). Matches mamba_simple.py:30-106 for
    the variable-B/C (dim==3) case used by VideoMamba.
    """
    dtype_in = u.dtype
    u32 = u.float()
    dt32 = dt.float()
    if dt_bias is not None:
        dt32 = dt32 + dt_bias.float()
    dt32 = F.softplus(dt32)
    bsz, seqlen, d = u32.shape
    n = A.shape[1]
    A32 = A.float()
    B32 = B_ssm.float()
    C32 = C_ssm.float()
    h = (
        torch.zeros(bsz, d, n, dtype=torch.float32)
        if h0 is None
        else h0.float().clone()
    )
    ys = []
    for t in range(seqlen):
        decay = torch.exp(dt32[:, t, :, None] * A32[None])          # (B,D,N)
        inject = (dt32[:, t, :] * u32[:, t, :])[:, :, None] * B32[:, t, None, :]
        h = decay * h + inject
        ys.append((h * C32[:, t, None, :]).sum(dim=-1))             # (B,D)
    y = torch.stack(ys, dim=1)                                      # (B,L,D)
    if D_skip is not None:
        y = y + u32 * D_skip.float()
    if z is not None:
        y = y * F.silu(z.float())
    return y.to(dtype_in), h


# -------------------------------------------------------------------- mixer

class OracleMamba(nn.Module):
    """Reference-semantics Mamba mixer (slow/functional path only).

    Parameter names & shapes identical to the reference Mamba
    (mamba_simple.py:176-281) so state_dict keys line up.
    """

    def __init__(
        self,
        d_model: int,
        d_state: int = 16,
        d_conv: int = 4,
        expand: int = 2,
        dt_rank="auto",
        conv_bias: bool = True,
        bias: bool = False,
        layer_idx: Optional[int] = None,
    ):
        super().__init__()
        self.d_model = d_model
        self.d_state = d_state
        self.d_conv = d_conv
        self.expand = expand
        self.d_inner = int(expand * d_model)
        self.dt_rank = (
            math.ceil(d_model / 16) if dt_rank == "auto" else int(dt_rank)
        )
        self.layer_idx = layer_idx
        self.in_proj = nn.Linear(d_model, 2 * self.d_inner, bias=bias)
        self.conv1d = nn.Conv1d(
            self.d_inner, self.d_inner, kernel_size=d_conv,
            groups=self.d_inner, padding=d_conv - 1, bias=conv_bias,
        )
        self.x_proj = nn.Linear(self.d_inner, self.dt_rank + 2 * d_state, bias=False)
        self.dt_proj = nn.Linear(self.dt_rank, self.d_inner, bias=True)
        self.A_log = nn.Parameter(
            torch.log(
                torch.arange(1, d_state + 1, dtype=torch.float32)
                .expand(self.d_inner, d_state)
                .contiguous()
            )
        )
        self.D = nn.Parameter(torch.ones(self.d_inner))
        self.out_proj = nn.Linear(self.d_inner, d_model, bias=bias)

    def allocate_state(self, batch_size: int) -> Tuple[torch.Tensor, torch.Tensor]:
        return (
            torch.zeros(batch_size, self.d_inner, self.d_conv),
            torch.zeros(batch_size, self.d_inner, self.d_state),
        )

    def forward(
        self,
        hidden_states: torch.Tensor,                                # (B, L, D)
        state: Optional[Tuple[torch.Tensor, torch.Tensor]] = None,
        return_state: bool = False,
        ssm_state: Optional[torch.Tensor] = None,
    ):
        """``ssm_state`` (bare tensor, no ``state``/``return_state``) is the
        reference's in-place path (mamba_simple.py:419-439): the conv runs
        with NO carried window, the scan starts from ``ssm_state``, and the
        caller's tensor is MUTATED to the advanced state
        (``ssm_state.copy_(last_state)``)."""
        if state is not None and ssm_state is not None:
            raise ValueError("Pass either state or ssm_state, not both.")
        inplace_ssm = ssm_state if state is None else None
        bsz, seqlen, _ = hidden_states.shape
        xz = self.in_proj(hidden_states)                            # (B,L,2Di)
        x, z = xz.chunk(2, dim=-1)

        # Depthwise causal conv over [conv_state || x] keeping the last L
        # outputs (mamba_simple.py:381-399), then SiLU (causal_conv1d_fn
        # activation contract).
        x_cf = x.transpose(1, 2)                                    # (B,Di,L)
        conv_state = None
        if state is not None:
            conv_state, ssm_state = state
            ctx = torch.cat([conv_state.to(x_cf.dtype), x_cf], dim=-1)
        else:
            ctx = x_cf
        conv = F.conv1d(
            ctx, self.conv1d.weight, self.conv1d.bias,
            padding=self.d_conv - 1, groups=self.d_inner,
        )[..., : ctx.shape[-1]][..., -seqlen:]
        conv = F.silu(conv).transpose(1, 2)                         # (B,L,Di)

        new_conv_state = None
        if return_state:
            # Raw-input window: last d_conv inputs of [state || x]
            # (mamba_simple.py:392 / :402-404, incl. zero left-pad if L<W).
            window_src = ctx if conv_state is not None else x_cf
            new_conv_state = F.pad(
                window_src, (self.d_conv - window_src.shape[-1], 0)
            )

        x_dbl = self.x_proj(conv)                                   # (B,L,r+2N)
        dt_low, B_ssm, C_ssm = torch.split(
            x_dbl, [self.dt_rank, self.d_state, self.d_state], dim=-1
        )
        dt = F.linear(dt_low, self.dt_proj.weight)                  # no bias here

        A = -torch.exp(self.A_log.float())
        y, h_last = selective_scan_oracle(
            conv, dt, A, B_ssm, C_ssm,
            D_skip=self.D, z=z, dt_bias=self.dt_proj.bias, h0=ssm_state,
        )
        out = self.out_proj(y)
        if inplace_ssm is not None:
            inplace_ssm.copy_(h_last.to(inplace_ssm.dtype))
        if return_state:
            assert new_conv_state is not None
            return out, (new_conv_state, h_last)
        return out


# --------------------------------------------------------------------- norm

class OracleRMSNorm(nn.Module):
    """RMSNorm with the mamba-ssm Triton kernel's semantics: fp32 internals,
    y = x / sqrt(mean(x^2) + eps) * weight (no bias)."""

    def __init__(self, dim: int, eps: float = 1e-5):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = None
        self.eps = eps

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x32 = x.float()
        y = x32 * torch.rsqrt(x32.pow(2).mean(dim=-1, keepdim=True) + self.eps)
        return (y * self.weight.float()).to(x.dtype)


# -------------------------------------------------------------------- block

class OracleBlock(nn.Module):
    """Add -> Norm -> Mixer with carried residual (videomamba.py:121-246).

    The fused and unfused reference branches compute the same values; this
    oracle implements the math once (fp32 residual when residual_in_fp32).
    """

    def __init__(self, dim: int, mixer: OracleMamba, norm: nn.Module,
                 residual_in_fp32: bool = True):
        super().__init__()
        self.mixer = mixer
        self.norm = norm
        self.residual_in_fp32 = residual_in_fp32

    def forward(
        self,
        hidden_states: torch.Tensor,
        residual: Optional[torch.Tensor] = None,
        state: Optional[Tuple[torch.Tensor, torch.Tensor]] = None,
        return_state: bool = False,
        ssm_state: Optional[torch.Tensor] = None,
    ):
        residual = hidden_states if residual is None else residual + hidden_states
        hidden_states = self.norm(residual.to(self.norm.weight.dtype))
        if self.residual_in_fp32:
            residual = residual.float()
        if state is not None and return_state:
            hidden_states, new_state = self.mixer(
                hidden_states, state=state, return_state=True
            )
            return hidden_states, residual, new_state
        hidden_states = self.mixer(hidden_states, state=state, ssm_state=ssm_state)
        return hidden_states, residual


# ------------------------------------------------------------------ refiner

class OracleBiMambaRefiner(nn.Module):
    """Reference-semantics BiMambaRefinerBlock (refiner_backbone.py:13-135):
    two independent unidirectional Blocks (fwd + frame-flipped bwd), sigmoid
    fusion gate over the concat, out_proj; only the fwd state streams.
    Parameter names match the reference module so state_dicts line up."""

    def __init__(self, dim: int, d_state: int = 16):
        super().__init__()
        self.block_fwd = OracleBlock(
            dim, OracleMamba(dim, d_state=d_state), OracleRMSNorm(dim),
            residual_in_fp32=True,
        )
        self.block_bwd = OracleBlock(
            dim, OracleMamba(dim, d_state=d_state), OracleRMSNorm(dim),
            residual_in_fp32=True,
        )
        self.fusion_gate = nn.Sequential(nn.Linear(dim * 2, dim), nn.Sigmoid())
        self.out_proj = nn.Linear(dim, dim)

    def _flip(self, v: torch.Tensor, packed) -> torch.Tensor:
        if packed is None:
            return torch.flip(v, dims=[1])
        b, t, n = packed
        return torch.flip(
            v.reshape(b, t, n, v.shape[-1]), dims=[1]
        ).reshape(b, t * n, v.shape[-1])

    def forward(self, x, state_fwd=None, state_bwd_init=None):
        packed = None
        if x.ndim == 4:
            b, t, n, c = x.shape
            packed = (b, t, n)
            x = x.reshape(b, t * n, c)
        bsz = x.shape[0]
        if state_fwd is None:
            state_fwd = self.block_fwd.mixer.allocate_state(bsz)
        out_fwd, _, new_state_fwd = self.block_fwd(
            x, state=state_fwd, return_state=True
        )
        if state_bwd_init is None:
            state_bwd_init = self.block_bwd.mixer.allocate_state(bsz)
        out_bwd = self._flip(
            self.block_bwd(
                self._flip(x, packed), state=state_bwd_init, return_state=True
            )[0],
            packed,
        )
        gate = self.fusion_gate(torch.cat([out_fwd, out_bwd], dim=-1))
        out = self.out_proj(gate * out_fwd + (1.0 - gate) * out_bwd)
        if packed is not None:
            b, t, n = packed
            out = out.reshape(b, t, n, -1)
        return out, new_state_fwd


# ------------------------------------------------------------------ encoder

class OraclePatchEmbed(nn.Module):
    def __init__(self, img_size=224, patch_size=16, kernel_size=1,
                 in_chans=3, embed_dim=768):
        super().__init__()
        img_size = (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        patch_size = (
            (patch_size, patch_size) if isinstance(patch_size, int) else tuple(patch_size)
        )
        self.img_size = img_size
        self.patch_size = patch_size
        self.num_patches = (img_size[1] // patch_size[1]) * (img_size[0] // patch_size[0])
        self.tubelet_size = kernel_size
        self.proj = nn.Conv3d(
            in_chans, embed_dim,
            kernel_size=(kernel_size, patch_size[0], patch_size[1]),
            stride=(kernel_size, patch_size[0], patch_size[1]),
        )

    def forward(self, x):
        return self.proj(x)


class OracleVideoMamba(nn.Module):
    """Reference-semantics encoder: patch embed + CLS + dual pos embeds +
    depth x Block + final norm + pooling (videomamba.py:371-1067).

    Deterministic only (drop_path is identity); CPU fp32.
    """

    def __init__(
        self,
        img_size: int = 224,
        patch_size: int = 16,
        depth: int = 24,
        embed_dim: int = 192,
        channels: int = 3,
        ssm_cfg: Optional[dict] = None,
        norm_epsilon: float = 1e-5,
        rms_norm: bool = True,
        residual_in_fp32: bool = True,
        pool_type: str = "cls+avg",
        kernel_size: int = 1,
        num_frames: int = 8,
        add_pool_norm: bool = True,
    ):
        super().__init__()
        self.depth = depth
        self.embed_dim = embed_dim
        self.pool_type = pool_type
        self.rms_norm = rms_norm
        self.residual_in_fp32 = residual_in_fp32
        self.add_pool_norm = add_pool_norm
        self.norm_epsilon = norm_epsilon
        ssm_cfg = dict(ssm_cfg or {})

        self.patch_embed = OraclePatchEmbed(
            img_size=img_size, patch_size=patch_size, kernel_size=kernel_size,
            in_chans=channels, embed_dim=embed_dim,
        )
        num_patches = self.patch_embed.num_patches
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, num_patches + 1, embed_dim))
        self.temporal_pos_embedding = nn.Parameter(
            torch.zeros(1, num_frames // kernel_size, embed_dim)
        )

        def make_norm():
            if rms_norm:
                return OracleRMSNorm(embed_dim, eps=norm_epsilon)
            return nn.LayerNorm(embed_dim, eps=norm_epsilon)

        self.layers = nn.ModuleList(
            [
                OracleBlock(
                    embed_dim,
                    OracleMamba(embed_dim, layer_idx=i, **ssm_cfg),
                    make_norm(),
                    residual_in_fp32=residual_in_fp32,
                )
                for i in range(depth)
            ]
        )
        self.norm = make_norm()
        if add_pool_norm:
            self.pool_norm = nn.LayerNorm(embed_dim)

    # ------------------------------------------------------------- pos embeds

    def _spatial_pos(self, grid_h: int, grid_w: int) -> torch.Tensor:
        patch_pos = self.pos_embed[:, 1:]
        base_h = self.patch_embed.img_size[0] // self.patch_embed.patch_size[0]
        base_w = self.patch_embed.img_size[1] // self.patch_embed.patch_size[1]
        if (grid_h, grid_w) == (base_h, base_w):
            return patch_pos
        pos = patch_pos.reshape(1, base_h, base_w, self.embed_dim).permute(0, 3, 1, 2)
        pos = F.interpolate(
            pos.float(), size=(grid_h, grid_w), mode="bicubic", align_corners=False
        )
        return pos.permute(0, 2, 3, 1).reshape(1, grid_h * grid_w, self.embed_dim)

    def _temporal_pos(self, seqlen: int, offset: int) -> torch.Tensor:
        pos = self.temporal_pos_embedding
        end = offset + seqlen
        if end <= pos.shape[1]:
            return pos[:, offset:end]
        resampled = F.interpolate(
            pos.permute(0, 2, 1).float(), size=end, mode="linear",
            align_corners=False,
        ).permute(0, 2, 1)
        return resampled[:, offset:end]

    # ---------------------------------------------------------------- forward

    def allocate_state(self, batch_size: int) -> List[Tuple[torch.Tensor, torch.Tensor]]:
        return [blk.mixer.allocate_state(batch_size) for blk in self.layers]

    def _visible_positions(self, mask: torch.Tensor, num_visible: int) -> torch.Tensor:
        token_count = mask.shape[1]
        positions = torch.arange(token_count).unsqueeze(0).expand(mask.shape[0], -1)
        positions = positions.masked_fill(mask.bool(), token_count)
        return torch.sort(positions, dim=1).values[:, :num_visible]

    def forward(
        self,
        x: torch.Tensor,                                     # (B, C, T, H, W)
        mask: Optional[torch.Tensor] = None,
        keep_temporal: bool = False,
        ssm_state: Optional[List[Tuple[torch.Tensor, torch.Tensor]]] = None,
        temporal_pos_offset: int = 0,
    ):
        emb = self.patch_embed(x)                            # (B,E,T',H',W')
        bsz, c, t, h, w = emb.shape
        spatial_pos = self._spatial_pos(h, w)
        temporal_pos = self._temporal_pos(t, temporal_pos_offset)
        tokens = emb.permute(0, 2, 3, 4, 1).reshape(bsz, t, h * w, c)
        tokens = tokens + spatial_pos.unsqueeze(1)
        tokens = tokens + temporal_pos.unsqueeze(2)
        tokens = tokens.reshape(bsz, t * h * w, c)

        # CLS only drops on continuation chunks of a FULL-state stream;
        # bare ssm-only states keep CLS on every chunk (reference
        # videomamba.py:646-653 checks state[0] is a 2-tuple).
        def _is_full(ls):
            return isinstance(ls, (list, tuple)) and len(ls) == 2

        has_cls = (
            ssm_state is None
            or temporal_pos_offset <= 0
            or not _is_full(ssm_state[0])
        )
        if has_cls:
            cls_tok = (self.cls_token + self.pos_embed[:, :1]).expand(bsz, -1, -1)
            tokens = torch.cat([cls_tok, tokens], dim=1)

        visible_positions = None
        if mask is not None:
            num_visible = int((~mask[0].bool()).sum())
            visible_positions = self._visible_positions(mask, num_visible)
            tokens = tokens.gather(
                1, visible_positions.unsqueeze(-1).expand(-1, -1, c)
            )

        hidden = tokens
        residual = None
        new_states: List[Tuple[torch.Tensor, torch.Tensor]] = []
        for idx, blk in enumerate(self.layers):
            if ssm_state is not None:
                layer_state = ssm_state[idx]
                if _is_full(layer_state):
                    hidden, residual, st = blk(
                        hidden, residual, state=layer_state, return_state=True
                    )
                    new_states.append(st)
                else:
                    # In-place path: blk mutates layer_state to the advanced
                    # scan state (mamba_simple.py:427-439).
                    hidden, residual = blk(hidden, residual, ssm_state=layer_state)
                    new_states.append(layer_state)
            else:
                hidden, residual = blk(hidden, residual)

        residual = hidden if residual is None else residual + hidden
        x_vis = self.norm(residual.to(self.norm.weight.dtype))

        if not self.add_pool_norm:
            if ssm_state is None:
                return x_vis
            return x_vis, new_states

        cls_token = x_vis[:, :1] if has_cls else None
        patch_tokens = x_vis[:, 1:] if has_cls else x_vis

        if self.pool_type == "cls":
            pool = self.pool_norm(cls_token)
        else:
            if keep_temporal:
                tokens_per_frame = h * w
                if mask is None:
                    temporal_avg = patch_tokens.reshape(
                        bsz, t, tokens_per_frame, -1
                    ).mean(2)
                else:
                    assert visible_positions is not None
                    patch_positions = (
                        visible_positions[:, 1:] - 1 if has_cls else visible_positions
                    )
                    frame_idx = patch_positions // tokens_per_frame
                    temporal_avg = torch.zeros(bsz, t, patch_tokens.shape[-1])
                    counts = torch.zeros(bsz, t, 1)
                    temporal_avg.scatter_add_(
                        1,
                        frame_idx.unsqueeze(-1).expand(-1, -1, patch_tokens.shape[-1]),
                        patch_tokens,
                    )
                    counts.scatter_add_(
                        1, frame_idx.unsqueeze(-1),
                        torch.ones(bsz, patch_tokens.shape[1], 1),
                    )
                    temporal_avg = temporal_avg / counts
                avg = temporal_avg
            else:
                avg = patch_tokens.mean(1, keepdim=True)
            if self.pool_type == "cls+avg":
                pool = self.pool_norm(cls_token + avg)
            elif self.pool_type == "cls_cat_avg":
                pool = self.pool_norm(torch.cat([cls_token, avg], dim=1))
            elif self.pool_type == "avg":
                pool = self.pool_norm(avg)
            else:
                raise ValueError(f"Unsupported pool_type: {self.pool_type}")

        if ssm_state is None:
            return patch_tokens, pool
        return patch_tokens, pool, new_states


# ---------------------------------------------------------------- init

def reference_style_init_(model: OracleVideoMamba, seed: int = 0) -> OracleVideoMamba:
    """Fill every parameter with realistic, NONZERO values.

    Roughly the reference init distributions (trunc-normal 0.02 linears,
    softplus-inverse dt bias in [dt_min, dt_max], S4D-real A_log) but with
    noise added to the constants (norm weights, D, temporal pos, cls) so a
    dropped/swapped tensor in the checkpoint bridge cannot hide behind a
    zero or identity initialization.
    """
    g = torch.Generator().manual_seed(seed)

    def tn(p, std=0.02):
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * std)

    tn(model.cls_token)
    tn(model.pos_embed)
    tn(model.temporal_pos_embedding)
    tn(model.patch_embed.proj.weight, std=0.05)
    tn(model.patch_embed.proj.bias, std=0.02)
    for blk in model.layers:
        with torch.no_grad():
            blk.norm.weight.copy_(
                1.0 + 0.05 * torch.randn(blk.norm.weight.shape, generator=g)
            )
            if getattr(blk.norm, "bias", None) is not None:
                tn(blk.norm.bias)
        m = blk.mixer
        tn(m.in_proj.weight)
        tn(m.conv1d.weight, std=0.2)
        tn(m.conv1d.bias, std=0.05)
        tn(m.x_proj.weight)
        with torch.no_grad():
            r = m.dt_rank
            m.dt_proj.weight.uniform_(-(r ** -0.5), r ** -0.5, generator=g)
            dt = torch.exp(
                torch.rand(m.d_inner, generator=g)
                * (math.log(0.1) - math.log(0.001))
                + math.log(0.001)
            ).clamp(min=1e-4)
            m.dt_proj.bias.copy_(dt + torch.log(-torch.expm1(-dt)))
            m.A_log.add_(0.05 * torch.randn(m.A_log.shape, generator=g))
            m.D.copy_(1.0 + 0.1 * torch.randn(m.D.shape, generator=g))
        tn(m.out_proj.weight, std=0.04)
    with torch.no_grad():
        model.norm.weight.copy_(
            1.0 + 0.05 * torch.randn(model.norm.weight.shape, generator=g)
        )
        if getattr(model.norm, "bias", None) is not None:
            tn(model.norm.bias)
        if model.add_pool_norm:
            model.pool_norm.weight.copy_(
                1.0 + 0.05 * torch.randn(model.pool_norm.weight.shape, generator=g)
            )
            tn(model.pool_norm.bias)
    return model
