"""Example: long-video streaming inference with the serving runtime.

Streams a minute-long synthetic 224x224@30fps clip through VideoMamba-Base
in bf16, 64-frame chunks, carrying the per-layer state across chunks — the
serving "preset A" configuration. Prints per-chunk pooled-feature norms and
aggregate throughput.

Run:  python examples/streaming_serving.py [--frames 1800] [--chunk 64]
      (use JAX_PLATFORMS=cpu with --preset tiny --frames 16 for a CPU demo)
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--preset", default="base",
                        choices=["tiny", "small", "middle", "base"])
    parser.add_argument("--frames", type=int, default=256)
    parser.add_argument("--chunk", type=int, default=64)
    parser.add_argument("--batch", type=int, default=1,
                        help="independent video streams per chip")
    parser.add_argument("--fp32", action="store_true")
    parser.add_argument("--mamba2", action="store_true",
                        help="serve the Mamba-2 (SSD) mixer variant")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from videomamba_tpu import StreamingSession
    from videomamba_tpu.data import iter_video_chunks
    from videomamba_tpu.models import presets

    dtype = jnp.float32 if args.fp32 else jnp.bfloat16
    name = f"videomamba_{args.preset}" + ("_m2" if args.mamba2 else "")
    model = getattr(presets, name)(
        num_frames=args.chunk, pool_type="avg", dtype=dtype, rng=0
    )
    print(f"model={args.preset}{'+ssd' if args.mamba2 else ''} "
          f"dtype={dtype.__name__} "
          f"chunk={args.chunk} frames={args.frames} streams={args.batch}")

    # Synthetic video stream (replace with your decoder's frames).
    video = jax.random.normal(
        jax.random.PRNGKey(0), (args.batch, 3, args.frames, 224, 224), dtype
    )

    session = StreamingSession(model, batch_size=args.batch, dtype=jnp.float32)

    t0 = time.perf_counter()
    n_frames = 0
    for i, (chunk, _) in enumerate(
        iter_video_chunks(video, args.chunk, model.patch_embed.tubelet_size)
    ):
        x_vis, x_pool = session.process(jnp.asarray(chunk))
        jax.block_until_ready(x_pool)
        n_frames += chunk.shape[2] * args.batch
        print(f"chunk {i:3d}: frames {n_frames:6d}  "
              f"|pool|={float(jnp.linalg.norm(x_pool.astype(jnp.float32))):.4f}")
    dt = time.perf_counter() - t0
    print(f"\nprocessed {n_frames} frames in {dt:.2f}s "
          f"(includes compile) -> {n_frames / dt:.0f} frames/sec "
          f"({n_frames / dt / 30:.1f}x real-time @30fps)")


if __name__ == "__main__":
    main()
