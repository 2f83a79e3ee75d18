"""Legacy import root (reference parity: models/__init__.py)."""

from videomamba_tpu.models.refiner import BiMambaRefinerBlock  # noqa: F401
from videomamba_tpu.models.videomamba import (  # noqa: F401
    PretrainVideoMamba,
    build_videomamba,
)
