"""Kernel-form selection for the fused Block is pure host logic — pin it.

Round-4's driver artifact showed an 8x Tiny-streaming latency swing
(BENCH_r03 0.30 ms -> BENCH_r04 2.38 ms p50 chunk) with commit 80de273's
form-selection rework as one candidate cause. These tests make the
geometry -> form mapping a tested contract so a selection regression can
never again hide behind chip contention. Geometries mirror the published
VideoMamba presets (reference models/videomamba/videomamba.py:1150-1200
channel table: Tiny 192 / Small 384 / Middle 576 / Base 768, expand=2,
d_state=16, d_conv=4).
"""

import pytest

from videomamba_tpu.ops.pallas.block_fused import (
    DEFAULT_BLOCK_L,
    select_block_form,
)


def _form(e, *, block_l=DEFAULT_BLOCK_L, weight_itemsize=2,
          hidden_itemsize=2, residual_fp32=True, f32_epilogue=False,
          checkpoints=False, pipeline_env=True, static_force="",
          block_l_forced=False):
    return select_block_form(
        e=e, d_inner=2 * e, n=16, width=4, block_l=block_l,
        weight_itemsize=weight_itemsize, hidden_itemsize=hidden_itemsize,
        residual_fp32=residual_fp32, f32_epilogue=f32_epilogue,
        checkpoints=checkpoints, pipeline_env=pipeline_env,
        static_force=static_force, block_l_forced=block_l_forced,
        verbose=False,
    )


@pytest.mark.parametrize(
    "embed,expected",
    [
        (192, "static-parity"),   # Tiny — the 0.58 ms chunk depends on this
        (384, "static-parity"),   # Small
        (576, "dynamic-slot"),    # Middle
        (768, "dynamic-slot"),    # Base (est ~16.8 MB, inside the window)
    ],
)
def test_serving_bf16_form_per_preset(embed, expected):
    assert _form(embed).name == expected


def test_training_always_plain():
    # The checkpoint stream couples the pipeline stages.
    for embed in (192, 384, 576, 768):
        assert _form(embed, checkpoints=True).name == "plain"


def test_pipeline_env_kill_switch():
    assert _form(192, pipeline_env=False).name == "plain"


def test_beyond_window_falls_back_unless_forced():
    # f32 weights at Base blow past the 18 MB window.
    auto = _form(768, weight_itemsize=4, f32_epilogue=True)
    assert auto.name == "plain"
    forced = _form(768, weight_itemsize=4, f32_epilogue=True,
                   block_l_forced=True)
    assert forced.name == "dynamic-slot" and forced.vmem_raise


def test_static_force_overrides_both_ways():
    assert _form(768, static_force="1").name == "static-parity"
    assert _form(192, static_force="0").name == "dynamic-slot"


def test_estimate_monotone_in_block_l():
    small = _form(768, block_l=64, block_l_forced=True)
    big = _form(768, block_l=256, block_l_forced=True)
    assert small.est < big.est
