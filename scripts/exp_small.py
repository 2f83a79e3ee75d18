"""Small-preset (d=384) full-clip efficiency attribution (round-4 item 5).

small_clip16 measured MFU 0.194 (BENCH_r03) vs Base 0.286 — the outlier.
Hypotheses: (a) arithmetic: Small has 2x the tokens of base_clip8 (16f vs
8f) and 1/4 the per-token matmul FLOPs, so the serial walk (constant
~19 ns/step/layer, L-proportional) weighs ~4x more against the FLOPs;
(b) tiling: block kernels tuned at d_inner=1536 pad badly at 768.

Probes (depth differencing within one process, chain-timed):
  clip24 / clip12          Small full-clip fwd at depth 24 / 12
  block_small / block_base one Block forward at Small / Base shapes
                           (isolated chains, for the comparison column)
  base24 / base12          base_clip8 equivalents

Usage: python scripts/exp_small.py [probe...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _chain_seconds_per_iter  # noqa: E402

N_BIG = int(os.environ.get("EXP_NBIG", "24"))


def probe_clip(preset, num_frames, depth):
    import jax
    import jax.numpy as jnp
    from videomamba_tpu.models import presets

    model = getattr(presets, f"videomamba_{preset}")(
        num_frames=num_frames, dtype=jnp.bfloat16, rng=0, depth=depth)
    params = model.params
    x = jax.random.normal(
        jax.random.PRNGKey(0), (4, 3, num_frames, 224, 224), jnp.bfloat16)

    def step(carry, x_arg, params_arg):
        x_vis, x_pool = model.forward(
            x_arg + (carry * 1e-6).astype(jnp.bfloat16), params=params_arg)
        return jnp.mean(x_pool).astype(jnp.float32)

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32), xs=(x, params),
        n_small=2, n_big=N_BIG, repeats=4)


def probe_block_fb(d_model, seqlen):
    """One Block forward at the given geometry, isolated chain."""
    import jax
    import jax.numpy as jnp
    from videomamba_tpu.models.block import Block
    from videomamba_tpu.models.mamba import Mamba

    blk = Block(dim=d_model, mixer=Mamba(d_model=d_model, layer_idx=0),
                norm_type="rms", fused_add_norm=True, residual_in_fp32=True,
                layer_idx=0)
    p = blk.init(jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, seqlen, d_model),
                          jnp.bfloat16)

    def step(carry, x_arg, p_arg):
        h, r = blk(p_arg, x_arg + (carry * 1e-6).astype(jnp.bfloat16), None)
        return jnp.mean(h).astype(jnp.float32)

    return _chain_seconds_per_iter(
        step, jnp.zeros((), jnp.float32), xs=(x, p),
        n_small=2, n_big=max(N_BIG * 3, 60), repeats=4)


PROBES = {
    "clip24": lambda: probe_clip("small", 16, 24),
    "clip12": lambda: probe_clip("small", 16, 12),
    "base24": lambda: probe_clip("base", 8, 24),
    "base12": lambda: probe_clip("base", 8, 12),
    "block_small": lambda: probe_block_fb(384, 3137),
    "block_base": lambda: probe_block_fb(768, 1569),
    # Discriminators between hypotheses (a) walk weight and (b) d=384
    # tiling: at equal L the walk time is equal (VPU-issue-bound,
    # d-independent), so block_384_short vs block_base separates the
    # matmul-efficiency ratio from the walk share; block_768_long checks
    # L-proportionality at Base width.
    "block_384_short": lambda: probe_block_fb(384, 1569),
    "block_768_long": lambda: probe_block_fb(768, 3137),
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    unknown = [n for n in names if n not in PROBES]
    if unknown:
        sys.exit(f"unknown probe(s) {unknown}; valid: {sorted(PROBES)}")
    for name in names:
        sec = PROBES[name]()
        print({"probe": name, "ms": round(sec * 1e3, 3)}, flush=True)
