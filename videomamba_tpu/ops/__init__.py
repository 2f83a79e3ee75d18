"""Numerics core: selective scan, causal conv, fused norms, resampling.

Pure-JAX implementations live here; Pallas fast-path kernels live in
``videomamba_tpu.ops.pallas`` and are selected via each op's dispatch flags.
"""

from videomamba_tpu.ops.causal_conv1d import causal_conv1d, causal_conv1d_update
from videomamba_tpu.ops.norm import fused_add_norm, layer_norm, rms_norm
from videomamba_tpu.ops.resample import (
    infer_spatial_grid,
    resample_bicubic_2d,
    resample_linear_1d,
)
from videomamba_tpu.ops.selective_scan import (
    selective_scan,
    selective_scan_bld,
    selective_state_update,
)

__all__ = [
    "causal_conv1d",
    "causal_conv1d_update",
    "fused_add_norm",
    "infer_spatial_grid",
    "layer_norm",
    "resample_bicubic_2d",
    "resample_linear_1d",
    "rms_norm",
    "selective_scan",
    "selective_scan_bld",
    "selective_state_update",
]
