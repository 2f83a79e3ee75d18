"""Example: VideoMAE-style masked pretraining step, sharded over a mesh.

Demonstrates the full training scaffold: tube masking, optimizer factory
with no-weight-decay masking, cosine-warmup schedule, and the jit-compiled
DP/FSDP train step over a device mesh. Runs on any device count (single TPU
chip, or CPU with XLA_FLAGS=--xla_force_host_platform_device_count=8
JAX_PLATFORMS=cpu for a mesh demo).

Run:  python examples/train_masked_pretrain.py --steps 5 [--cpu-devices 8]
"""

import argparse
import os
import sys
from types import SimpleNamespace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=5)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--img", type=int, default=32)
    parser.add_argument("--mask-ratio", type=float, default=0.75)
    parser.add_argument("--cpu-devices", type=int, default=0,
                        help="force an N-device virtual CPU mesh")
    args = parser.parse_args()

    import jax

    if args.cpu_devices:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_devices)
    import jax.numpy as jnp

    from videomamba_tpu.data import TubeMaskingGenerator
    from videomamba_tpu.models import PretrainVideoMamba
    from videomamba_tpu.parallel import (
        batch_sharding, init_train_state, make_mesh, make_train_step,
    )
    from videomamba_tpu.utils.optimizer import create_optimizer
    from videomamba_tpu.utils.scheduler import get_cosine_schedule_with_warmup
    from videomamba_tpu.utils.basic_utils import MetricLogger, compute_n_params
    from videomamba_tpu.utils.profiling import StepTimer

    model = PretrainVideoMamba(
        img_size=args.img, patch_size=16, depth=4, embed_dim=128, channels=3,
        fused_add_norm=True, rms_norm=True, residual_in_fp32=True,
        kernel_size=1, num_frames=args.frames, add_pool_norm=False, rng=0,
    )
    print(f"params: {compute_n_params(model)}")

    n_dev = len(jax.devices())
    fsdp = 2 if n_dev % 2 == 0 and n_dev > 1 else 1
    mesh = make_mesh({"dp": n_dev // fsdp, "fsdp": fsdp, "tp": 1})
    print(f"mesh: {dict(mesh.shape)}")
    data_devices = mesh.shape["dp"] * mesh.shape["fsdp"]
    if args.batch % data_devices:
        args.batch = data_devices * max(1, args.batch // data_devices)
        print(f"batch rounded to {args.batch} (divisible by {data_devices} data shards)")

    schedule = get_cosine_schedule_with_warmup(
        base_lr=1e-3, num_warmup_steps=2, num_training_steps=args.steps,
    )
    opt_args = SimpleNamespace(opt="adamw", lr=schedule, weight_decay=0.05,
                               momentum=0.9)
    tx = create_optimizer(opt_args, model)

    grid = (args.frames, args.img // 16, args.img // 16)
    mask_gen = TubeMaskingGenerator(grid, args.mask_ratio)

    # A fixed mask keeps the compiled step shape-stable (equal visible
    # counts are guaranteed by the generator; for per-step masks, precompute
    # a small bank and cycle it — each distinct count compiles once).
    import numpy as np

    mask = mask_gen(args.batch, rng=np.random.default_rng(0))
    n_visible = int((~mask[0]).sum())

    def loss_fn(params, batch, rng):
        x_vis = model.apply(
            params, batch["video"], mask=mask, deterministic=False, rng=rng
        )
        target = batch["target"]
        loss = jnp.mean(jnp.square(
            x_vis.astype(jnp.float32) - target.astype(jnp.float32)
        ))
        return loss, {"loss": loss}

    with mesh:
        params, opt_state, step = init_train_state(model, tx, mesh=mesh)
        train_step = make_train_step(model, tx, loss_fn=loss_fn)
        data_sh = batch_sharding(mesh, "dp", "fsdp")

        logger = MetricLogger()
        timer = StepTimer()
        key = jax.random.PRNGKey(0)
        for i in range(args.steps):
            key, k1, k2 = jax.random.split(key, 3)
            video = jax.device_put(
                jax.random.normal(
                    k1, (args.batch, 3, args.frames, args.img, args.img)
                ),
                data_sh,
            )
            # Targets for visible tokens (e.g. teacher features / pixels).
            target = jax.device_put(
                jax.random.normal(k2, (args.batch, n_visible, 128)), data_sh
            )
            batch = {"video": video, "target": target}
            params, opt_state, step, metrics = train_step(
                params, opt_state, step, batch, jax.random.PRNGKey(42)
            )
            dt = timer.tick(metrics)
            logger.update(loss=metrics["loss"], grad_norm=metrics["grad_norm"])
            print(f"step {i}: loss={float(metrics['loss']):.5f} "
                  f"grad_norm={float(metrics['grad_norm']):.4f} ({dt:.3f}s)")
        print("\n" + timer.summary())


if __name__ == "__main__":
    main()
