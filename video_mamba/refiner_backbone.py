"""Alias shim (reference parity: video_mamba/refiner_backbone.py)."""

from videomamba_tpu.models.refiner import BiMambaRefinerBlock  # noqa: F401
