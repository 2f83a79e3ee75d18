"""VideoMamba model-size presets (paper sizes; reference README/driver configs).

Tiny is the reference README quick-usage config (README.md:19-47); Small,
Middle, and Base follow the VideoMamba paper sizing used by the driver's
benchmark configs (BASELINE.md).
"""

from __future__ import annotations

from typing import Any, Dict

from videomamba_tpu.models.videomamba import PretrainVideoMamba

PRESETS: Dict[str, Dict[str, Any]] = {
    "tiny": dict(embed_dim=192, depth=24),
    "small": dict(embed_dim=384, depth=24),
    "middle": dict(embed_dim=576, depth=32),
    "base": dict(embed_dim=768, depth=24),
}


def _build(preset: str, **overrides) -> PretrainVideoMamba:
    kwargs: Dict[str, Any] = dict(
        img_size=224,
        patch_size=16,
        channels=3,
        drop_path_rate=0.0,
        ssm_cfg=None,
        norm_epsilon=1e-5,
        fused_add_norm=True,
        rms_norm=True,
        residual_in_fp32=True,
        bimamba=True,
        pool_type="cls+avg",
        kernel_size=1,
        num_frames=8,
    )
    kwargs.update(PRESETS[preset])
    kwargs.update(overrides)
    return PretrainVideoMamba(**kwargs)


def videomamba_tiny(**overrides) -> PretrainVideoMamba:
    return _build("tiny", **overrides)


def videomamba_small(**overrides) -> PretrainVideoMamba:
    return _build("small", **overrides)


def videomamba_middle(**overrides) -> PretrainVideoMamba:
    return _build("middle", **overrides)


def videomamba_base(**overrides) -> PretrainVideoMamba:
    return _build("base", **overrides)
