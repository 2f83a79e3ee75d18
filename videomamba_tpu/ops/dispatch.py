"""Kernel-backend dispatch: pick Pallas fast paths when they apply.

Central registry for the ``use_fast_path`` decision (the reference gates its
fused CUDA/Triton kernels the same way, mamba_simple.py:343-367). Pure-XLA
implementations are always available and are the numerical reference; Pallas
kernels must match them to <=1e-5 (enforced in tests) before being preferred.
"""

from __future__ import annotations

import functools
import os

import jax

_FORCE_SCAN_METHOD_ENV = "VIDEOMAMBA_SCAN_METHOD"


@functools.lru_cache(maxsize=1)
def on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover - backend probing must never raise
        return False


def pallas_scan_available() -> bool:
    """True when the Pallas selective-scan kernel can run here.

    Set VIDEOMAMBA_PALLAS_INTERPRET=1 to run the kernel in interpreter mode
    off-TPU (testing only).
    """
    if not on_tpu() and not interpret_mode():
        return False
    try:
        from videomamba_tpu.ops.pallas import scan as _  # noqa: F401

        return True
    except ImportError:
        return False


def interpret_mode() -> bool:
    return os.getenv("VIDEOMAMBA_PALLAS_INTERPRET", "").lower() in {
        "1", "true", "yes", "on"
    }


def preferred_scan_method() -> str:
    """Scan backend for fast-path callers: env override > pallas > chunked.

    A forced "pallas" still requires the kernel to be runnable here (TPU or
    interpret mode) — otherwise fall back to the exact chunked path rather
    than crash at lowering time.
    """
    forced = os.getenv(_FORCE_SCAN_METHOD_ENV, "").strip().lower()
    if forced in {"ref", "chunked"}:
        return forced
    if forced == "pallas":
        return "pallas" if pallas_scan_available() else "chunked"
    if pallas_scan_available():
        return "pallas"
    return "chunked"


# Every env knob that changes a traced kernel program. Model-level jit
# caches (e.g. PretrainVideoMamba._get_core) must fold this fingerprint into
# their cache key — otherwise flipping a knob after the first call with the
# same shapes silently reuses the stale trace (the in-process A/B pitfall).
_KERNEL_KNOB_ENVS = (
    "VIDEOMAMBA_DISABLE_FUSED",
    "VIDEOMAMBA_SCAN_METHOD",
    "VIDEOMAMBA_SSD_METHOD",
    "VIDEOMAMBA_PALLAS_INTERPRET",
    "VIDEOMAMBA_MIXER_BLOCK_L",
    "VIDEOMAMBA_MIXER_PIPELINE",
    "VIDEOMAMBA_MIXER_BWD",
    "VIDEOMAMBA_BLOCK_BLOCK_L",
    "VIDEOMAMBA_BLOCK_PIPELINE",
    "VIDEOMAMBA_BLOCK_STATIC",
    "VIDEOMAMBA_BLOCK_BWD",
    "VIDEOMAMBA_NORM_BWD",
    "VIDEOMAMBA_SSD_BWD",
    "VIDEOMAMBA_SSD_BWD_MERGED",
    "VIDEOMAMBA_SSD_FWD_MERGED",
    "VIDEOMAMBA_SSD_PMIXER",
    "VIDEOMAMBA_SSD_TRAIN_ROUTE",
)


def ssd_pmixer_enabled() -> bool:
    """Projected-mixer SSD kernel (in/out_proj fused into the scan kernel,
    default) vs the mixer-level route (projections in XLA around
    ssd_mixer_pallas). ``VIDEOMAMBA_SSD_PMIXER=0`` opts out. Read at trace
    time — part of :func:`kernel_knob_fingerprint`."""
    return os.getenv("VIDEOMAMBA_SSD_PMIXER", "1").strip().lower() not in {
        "0", "false", "off", "no"
    }


def ssd_train_route() -> str:
    """Differentiated-call route for :func:`ssd_projected_mixer` — which
    forward/backward decomposition runs under ``jax.grad``.

    ``"mixer"`` (default): the custom-vjp pair runs the DECOMPOSED route —
    in/out projections as plain XLA matmuls around the ``ssd_mixer_pallas``
    core (fwd-with-checkpoints + mega-backward). With the MXU-merged kernels
    the scan core has few idle MXU slots left, so the projections are faster
    as standalone MXU-peak matmuls than fused into the kernel: measured
    Base m2 train step 50.5 ms vs 62.4 ms for the fused pmixer pair
    (2026-08-20, v5e; see the ROADMAP round-5 closeout attribution table).

    ``"pmixer"``: keep the one-kernel merged projected-mixer backward
    (A/B + fallback; it was the round-4 flagship before the merged kernels
    landed).

    Inference (the primal, non-differentiated call) always runs the fused
    projected-mixer kernel either way — it remains the measured serving
    winner (30.1 vs 33.5 ms Base chunk). Read at trace time — part of
    :func:`kernel_knob_fingerprint` for cache safety.
    """
    v = os.getenv("VIDEOMAMBA_SSD_TRAIN_ROUTE", "mixer").strip().lower()
    return "pmixer" if v == "pmixer" else "mixer"


def ssd_bwd_fused_enabled() -> bool:
    """Mega-fused SSD mixer backward (default) vs the composite backward
    (XLA conv recompute + epilogue vjp around the bare scan-bwd kernel).

    ``VIDEOMAMBA_SSD_BWD=composite`` opts out (A/B + fallback). Read at
    trace time — part of :func:`kernel_knob_fingerprint` for cache safety.
    """
    return os.getenv("VIDEOMAMBA_SSD_BWD", "fused").strip().lower() != "composite"


def ssd_bwd_merged_enabled() -> bool:
    """MXU-merged mega-backward (default, ngroups == 1 only) vs the per-head
    mega-backward. The merged kernel hoists the per-head decay scales onto
    shared operands so the state-coupled gradients run as a few big MXU
    dots — measured 2.84x faster per layer at Base train shapes.

    ``VIDEOMAMBA_SSD_BWD_MERGED=0`` opts out (A/B + fallback). Read at
    trace time — part of :func:`kernel_knob_fingerprint` for cache safety.
    """
    return os.getenv("VIDEOMAMBA_SSD_BWD_MERGED", "1").strip().lower() not in {
        "0", "false", "off", "no"
    }


def ssd_fwd_merged_enabled() -> bool:
    """MXU-merged mixer forward (default, ngroups == 1 only) vs the
    per-head forward walk. Same merge as the backward: the inter-chunk y
    and state-update dots run over all heads at once against a transposed
    (N, DI) state. When this knob is on, training residual ``hins``
    checkpoints are emitted in the transposed layout (consumed natively by
    the merged backward; the per-head/composite backwards transpose once
    in XLA).

    ``VIDEOMAMBA_SSD_FWD_MERGED=0`` opts out. Read at trace time — part of
    :func:`kernel_knob_fingerprint` for cache safety.
    """
    return os.getenv("VIDEOMAMBA_SSD_FWD_MERGED", "1").strip().lower() not in {
        "0", "false", "off", "no"
    }


def kernel_knob_fingerprint() -> tuple:
    """Hashable snapshot of every kernel-selection env knob.

    Include this in any long-lived jit-cache key that wraps kernel dispatch
    so an env-var flip re-traces instead of reusing a stale program.
    """
    return tuple(os.getenv(k) for k in _KERNEL_KNOB_ENVS)


_FORCE_SSD_METHOD_ENV = "VIDEOMAMBA_SSD_METHOD"


def preferred_ssd_method() -> str:
    """SSD (Mamba-2) backend for fast-path callers: env > pallas > chunked.

    Same contract as :func:`preferred_scan_method`; the Pallas SSD kernel
    needs a TPU backend or interpret mode, otherwise the exact XLA chunked
    path runs.
    """
    forced = os.getenv(_FORCE_SSD_METHOD_ENV, "").strip().lower()
    if forced in {"ref", "chunked"}:
        return forced
    runnable = on_tpu() or interpret_mode()
    if forced == "pallas":
        return "pallas" if runnable else "chunked"
    return "pallas" if runnable else "chunked"
