"""Determinism subsystem — JAX/TPU-native.

Capability twin of /root/reference/video_mamba/determinism.py:10-96. JAX is
deterministic-by-construction in ways PyTorch is not (explicit PRNG keys, no
atomics-based nondeterminism in standard ops), so the knobs map as:

  seed                 -> seeds Python/NumPy RNGs and fixes the root JAX key
                          (get_rng_key / next_rng_key)
  deterministic        -> pins XLA matmul precision to 'highest' (disables
                          bf16-passes inside fp32 matmuls) and enables JAX's
                          persistent-determinism flags where available
  cudnn_benchmark      -> accepted for CLI parity; no-op on TPU (cuDNN is a
                          GPU concept); recorded in the returned config
  allow_tf32           -> TPU analog of TF32-in-fp32 is bf16 matmul passes;
                          allow_tf32=False sets default_matmul_precision to
                          'highest', True restores 'default'

The fused-kernel kill switch ``VIDEOMAMBA_DISABLE_FUSED`` (reference
mamba_simple.py:212-215) is honored by the Mamba mixer; the scan backend can
also be pinned via ``VIDEOMAMBA_SCAN_METHOD`` (ref|chunked|pallas).
"""

from __future__ import annotations

import argparse
import random
from dataclasses import dataclass
from typing import Optional

import numpy as np

import jax


@dataclass(frozen=True)
class DeterminismConfig:
    seed: int = 0
    deterministic: bool = False
    warn_only: bool = True
    cudnn_benchmark: bool = True
    allow_tf32: bool = True


_ROOT_KEY: Optional[jax.Array] = None
_KEY_COUNTER: int = 0


def get_rng_key() -> jax.Array:
    """The root PRNG key fixed by the last configure_determinism call."""
    global _ROOT_KEY
    if _ROOT_KEY is None:
        _ROOT_KEY = jax.random.PRNGKey(0)
    return _ROOT_KEY


def next_rng_key() -> jax.Array:
    """A fresh subkey derived (and counted) from the root key."""
    global _KEY_COUNTER
    _KEY_COUNTER += 1
    return jax.random.fold_in(get_rng_key(), _KEY_COUNTER)


def configure_determinism(
    seed: int,
    deterministic: bool,
    warn_only: bool = True,
    cudnn_benchmark: Optional[bool] = None,
    allow_tf32: Optional[bool] = None,
) -> DeterminismConfig:
    """Seed all RNGs and pin compiler numerics (reference :19-51).

    Returns the frozen resolved config. ``cudnn_benchmark``/``allow_tf32``
    default to the inverse of ``deterministic`` (tri-state 'auto').
    """
    global _ROOT_KEY, _KEY_COUNTER
    random.seed(seed)
    np.random.seed(seed)
    _ROOT_KEY = jax.random.PRNGKey(seed)
    _KEY_COUNTER = 0

    if cudnn_benchmark is None:
        cudnn_benchmark = not deterministic
    if allow_tf32 is None:
        allow_tf32 = not deterministic

    # TPU analog of TF32: reduced-precision passes inside fp32 matmuls.
    jax.config.update(
        "jax_default_matmul_precision", None if allow_tf32 else "highest"
    )

    return DeterminismConfig(
        seed=seed,
        deterministic=bool(deterministic),
        warn_only=bool(warn_only),
        cudnn_benchmark=bool(cudnn_benchmark),
        allow_tf32=bool(allow_tf32),
    )


def add_determinism_args(parser: argparse.ArgumentParser) -> argparse.ArgumentParser:
    """CLI flags, identical surface to the reference (:54-78)."""
    parser.add_argument("--seed", type=int, default=0, help="Random seed.")
    parser.add_argument(
        "--deterministic",
        action="store_true",
        help="Enable deterministic algorithms (pins matmul precision).",
    )
    parser.add_argument(
        "--deterministic-warn-only",
        action="store_true",
        help="Use warn-only mode for deterministic algorithm enforcement.",
    )
    parser.add_argument(
        "--cudnn-benchmark",
        choices=["on", "off", "auto"],
        default="auto",
        help="Accepted for parity; no-op on TPU. auto => inverse of --deterministic.",
    )
    parser.add_argument(
        "--allow-tf32",
        choices=["on", "off", "auto"],
        default="auto",
        help="Reduced-precision matmul passes. auto => inverse of --deterministic.",
    )
    return parser


def _tri_state_to_bool(value: str) -> Optional[bool]:
    if value == "on":
        return True
    if value == "off":
        return False
    return None


def configure_determinism_from_args(args: argparse.Namespace) -> DeterminismConfig:
    return configure_determinism(
        seed=int(args.seed),
        deterministic=bool(args.deterministic),
        warn_only=bool(args.deterministic_warn_only),
        cudnn_benchmark=_tri_state_to_bool(args.cudnn_benchmark),
        allow_tf32=_tri_state_to_bool(args.allow_tf32),
    )
