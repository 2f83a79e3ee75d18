"""Profile one streaming chunk on the TPU and print a device-time breakdown.

Usage:  python scripts/profile_chunk.py [--preset tiny|base] [--frames 16]
        [--batch 1] [--iters 8] [--outdir /tmp/prof_chunk]

Methodology: run a dependent-chain loop of continuation chunks (the same
program bench.py times) inside a jax.profiler trace, then parse the
trace's device events directly (no TensorBoard needed) and aggregate
duration by kernel/fusion name. The async dispatch tunnel makes wall-clock
per-op timing meaningless — device events are the ground truth.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(outdir: str):
    """Aggregate device-side event durations by name from a jax trace dir."""
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {outdir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # Device lanes: pid whose process_name mentions TPU/device XLA ops.
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "/device:" in name or "Device" in name
    }
    agg = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    tmin, tmax = float("inf"), 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        ts = float(e.get("ts", 0.0))
        agg[name][0] += dur
        agg[name][1] += 1
        total += dur
        tmin = min(tmin, ts)
        tmax = max(tmax, ts + dur)
    return path, agg, total, (tmax - tmin if tmax > tmin else 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--preset", default="tiny", choices=["tiny", "base"])
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--outdir", default="/tmp/prof_chunk")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--m2", action="store_true",
                    help="profile the Mamba-2 (SSD) mixer variant")
    ap.add_argument("--chunk-size", type=int, default=64)
    ap.add_argument("--d-state", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from videomamba_tpu.models.presets import videomamba_base, videomamba_tiny
    from videomamba_tpu.utils.profiling import trace

    preset = videomamba_tiny if args.preset == "tiny" else videomamba_base
    kw = {}
    if args.m2:
        kw["ssm_cfg"] = {"layer": "Mamba2", "d_state": args.d_state,
                         "headdim": 64, "chunk_size": args.chunk_size}
    model = preset(num_frames=args.frames, pool_type="avg",
                   add_pool_norm=False, dtype=jnp.bfloat16, rng=0, **kw)
    params = model.params
    chunk = jax.random.normal(
        jax.random.PRNGKey(0),
        (args.batch, 3, args.frames, 224, 224), jnp.bfloat16,
    )
    state0 = model.allocate_state(args.batch)

    def step(carry, chunk_arg, params_arg):
        state, acc = carry
        out, new_state = model.forward_features(
            chunk_arg + (acc * 1e-6).astype(jnp.bfloat16),
            ssm_state=state, temporal_pos_offset=1, params=params_arg,
        )
        return new_state, jnp.mean(out).astype(jnp.float32)

    @jax.jit
    def run(carry, n, chunk_arg, params_arg):
        out = jax.lax.fori_loop(
            0, n, lambda i, c: step(c, chunk_arg, params_arg), carry
        )
        return out[1]

    carry0 = (state0, jnp.zeros((), jnp.float32))
    print("warmup/compile ...", flush=True)
    jax.device_get(run(carry0, 2, chunk, params))
    print("tracing ...", flush=True)
    with trace(args.outdir):
        jax.device_get(run(carry0, args.iters, chunk, params))

    path, agg, total_us, span_us = parse_trace(args.outdir)
    print(f"trace: {path}")
    print(f"device-busy total: {total_us / 1e3:.3f} ms over {args.iters} iters "
          f"({total_us / 1e3 / args.iters:.3f} ms/iter); "
          f"span {span_us / 1e3:.3f} ms "
          f"(gap {(span_us - total_us) / 1e3:.3f} ms)")
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]
    for name, (dur, cnt) in rows:
        print(f"{dur / 1e3:9.3f} ms  x{cnt:5d}  "
              f"{dur / 1e3 / args.iters:8.4f} ms/iter  {name[:90]}")


if __name__ == "__main__":
    main()
