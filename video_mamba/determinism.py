"""Alias shim (reference parity: video_mamba/determinism.py)."""

from videomamba_tpu.determinism import (  # noqa: F401
    DeterminismConfig,
    add_determinism_args,
    configure_determinism,
    configure_determinism_from_args,
)
