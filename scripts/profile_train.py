"""Profile the Base train step on TPU; print device-time breakdown by kernel.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_train.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from scripts.profile_chunk import parse_trace  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from videomamba_tpu.models.presets import videomamba_base
    from videomamba_tpu.parallel.train_step import make_train_step
    from videomamba_tpu.utils.profiling import trace

    import os
    iters = int(os.environ.get("PROF_ITERS", "1"))
    depth = int(os.environ.get("PROF_DEPTH", "24"))
    ssm_cfg = None
    if os.environ.get("PROF_M2", "0") == "1":
        ssm_cfg = {"layer": "Mamba2", "d_state": 64,
                   "headdim": int(os.environ.get("PROF_HEADDIM", "64")),
                   "chunk_size": 128}
    model = videomamba_base(num_frames=8, depth=depth, ssm_cfg=ssm_cfg)
    tx = optax.adamw(1e-4, weight_decay=0.05)
    params = model.params
    opt_state = jax.jit(tx.init)(params)
    video = jax.random.normal(
        jax.random.PRNGKey(0), (4, 3, 8, 224, 224), jnp.float32)
    out_shape = jax.eval_shape(
        lambda p, v: model.apply(p, v, deterministic=True), params, video)
    x_vis = out_shape[0] if isinstance(out_shape, tuple) else out_shape
    target = jnp.zeros(x_vis.shape, jnp.float32)
    train_step = make_train_step(
        model, tx, compute_dtype=jnp.bfloat16, donate=False)

    @jax.jit
    def run(carry, n, video, target, rng):
        def body(i, c):
            p, o, s = c
            p, o, s, _ = train_step(p, o, s, {"video": video,
                                              "target": target}, rng)
            return (p, o, s)
        out = jax.lax.fori_loop(0, n, body, carry)
        return out[2]

    carry0 = (params, opt_state, jnp.zeros((), jnp.int32))
    print("warmup/compile ...", flush=True)
    jax.device_get(run(carry0, 2, video, target, jax.random.PRNGKey(1)))
    print("tracing ...", flush=True)
    with trace("/tmp/prof_train"):
        jax.device_get(run(carry0, iters, video, target,
                           jax.random.PRNGKey(1)))

    path, agg, total_us, span_us = parse_trace("/tmp/prof_train")
    print(f"trace: {path}")
    print(f"device-busy {total_us / 1e3:.2f} ms / {iters} iters "
          f"= {total_us / 1e3 / iters:.2f} ms/iter (overlap possible)")
    import collections
    by_prefix = collections.defaultdict(lambda: [0.0, 0])
    for name, (dur, cnt) in agg.items():
        prefix = name.split(".")[0]
        by_prefix[prefix][0] += dur
        by_prefix[prefix][1] += cnt
    for name, (dur, cnt) in sorted(by_prefix.items(), key=lambda kv: -kv[1][0])[:18]:
        print(f"{dur / 1e3:9.3f} ms  x{cnt:5d}  {dur / 1e3 / iters:8.4f} "
              f"ms/iter  {name[:80]}")


if __name__ == "__main__":
    main()
