"""bench.py unit smoke: the driver runs bench on TPU at round end, so a
Python-level breakage there would silently cost the round's metrics. Keep
the pure pieces importable and sane on CPU."""

import jax.numpy as jnp
import pytest

import bench
from videomamba_tpu.models.presets import videomamba_tiny


def test_model_forward_flops_scales():
    model = videomamba_tiny(num_frames=8, rng=0)
    f1 = bench.model_forward_flops(model, 1, 1569)
    f2 = bench.model_forward_flops(model, 2, 1569)
    assert f1 > 1e9
    assert abs(f2 / f1 - 2.0) < 1e-6  # linear in batch
    # in/out projections dominate: crude sanity vs hand count
    hand = 24 * (2 * 1569 * 192 * 2 * 384 + 2 * 1569 * 384 * 192)
    assert f1 > hand  # includes scan/conv/x_proj on top


def test_chain_samples_measures_positive_time():
    def step(c):
        return (c[0] + 1.0,)

    samples = bench._chain_samples(
        step, (jnp.zeros(()),), n_small=1, n_big=4, repeats=2
    )
    assert len(samples) == 2
    assert all(s > 0 for s in samples)


@pytest.mark.slow
def test_bench_parity_runs_on_cpu():
    out = bench.bench_parity()
    assert out["tiny_chunked_vs_full_rel_err"] < 1e-3


@pytest.mark.slow
def test_bench_soak_runs_on_cpu():
    """Small-scale soak smoke (the TPU run uses 64 chunks)."""
    out = bench.bench_soak(chunks=3, chunk_frames=2)
    assert out["tiny_soak3_vs_full_rel_err"] < 1e-3
    assert out["tiny_soak3_last_chunk_rel_err"] < 1e-3
