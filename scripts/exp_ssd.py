"""Measure the Mamba-2 (SSD) mixer against the Mamba-1 walk at Base scale.

The walk-floor analysis (ROADMAP) pinned Base train at ~83 ms and the serving
chunk at ~38 ms on the Mamba-1 VPU walk. This experiment answers: what does
the same-geometry model (embed 768, depth 24) cost when the sequence mix is
the chunked-matmul SSD instead?

Run on the real chip:  python scripts/exp_ssd.py [--quick]
"""

import argparse
import sys

sys.path.insert(0, ".")

from bench import (  # noqa: E402
    PEAK_FLOPS,
    _chain_seconds_per_iter,
    bench_train_step,
    model_forward_flops,
)


def m2_base(num_frames=8, chunk_size=64, d_state=64, **overrides):
    from videomamba_tpu.models.presets import _build

    return _build(
        "base",
        num_frames=num_frames,
        ssm_cfg={
            "layer": "Mamba2",
            "d_state": d_state,
            "headdim": 64,
            "chunk_size": chunk_size,
        },
        **overrides,
    )


def bench_m2_stream(chunk_frames=64, batch_size=1, quick=False,
                    chunk_size=64, d_state=64):
    import jax
    import jax.numpy as jnp

    model = m2_base(num_frames=chunk_frames, chunk_size=chunk_size,
                    d_state=d_state, dtype=jnp.bfloat16)
    params = model.params
    state0 = model.allocate_state(batch_size, dtype=jnp.bfloat16)
    chunk = jax.random.normal(
        jax.random.PRNGKey(0),
        (batch_size, 3, chunk_frames, 224, 224), jnp.bfloat16)

    def step(carry, chunk_arg, params_arg):
        st, acc = carry
        _, new_state = model.forward_features(
            chunk_arg + (acc * 1e-6).astype(chunk_arg.dtype),
            ssm_state=st, temporal_pos_offset=1, params=params_arg)
        acc = jnp.mean(
            jax.tree_util.tree_leaves(new_state)[0].astype(jnp.float32))
        return (new_state, acc)

    sec = _chain_seconds_per_iter(
        step, (state0, jnp.zeros((), jnp.float32)), xs=(chunk, params),
        n_small=2, n_big=6 if quick else 12, repeats=2 if quick else 4)
    tokens = chunk_frames * 196
    fps = batch_size * chunk_frames / sec
    flops = model_forward_flops(model, batch_size, tokens)
    return {"m2_stream_fps": fps, "m2_chunk_ms": sec * 1e3,
            "m2_stream_mfu": flops / sec / PEAK_FLOPS}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--d-state", type=int, default=64)
    ap.add_argument("--what", default="all",
                    choices=["all", "train", "stream"])
    args = ap.parse_args()

    if args.what in ("all", "train"):
        r = bench_train_step(
            lambda **kw: m2_base(chunk_size=args.chunk_size,
                                 d_state=args.d_state, **kw),
            "m2_base_train", num_frames=8, batch_size=4, quick=args.quick)
        print({k: round(v, 4) for k, v in r.items()}, flush=True)

    if args.what in ("all", "stream"):
        r = bench_m2_stream(quick=args.quick, chunk_size=args.chunk_size,
                            d_state=args.d_state)
        print({k: round(v, 4) for k, v in r.items()}, flush=True)


if __name__ == "__main__":
    main()
