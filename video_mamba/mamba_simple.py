"""Alias shim (reference parity: video_mamba/mamba_simple.py)."""

from videomamba_tpu.models.mamba import Mamba  # noqa: F401
