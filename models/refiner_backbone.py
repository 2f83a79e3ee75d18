"""Legacy shim (reference parity: models/refiner_backbone.py)."""

from videomamba_tpu.models.refiner import BiMambaRefinerBlock  # noqa: F401
