"""Legacy shim (reference parity: models/videomamba/mamba_simple.py)."""

from videomamba_tpu.models.mamba import Mamba  # noqa: F401
from videomamba_tpu.ops.selective_scan import (  # noqa: F401
    selective_scan as selective_scan_fn,
    selective_state_update,
)
